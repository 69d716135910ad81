package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Statements
import graft.operators.EntityQuery
import graft.sources.{FtmJson, StatementStore}

/** Command-line surface mirroring the reference CLI (cli.py: init /
  * optimize, plus the store write/query paths its ftmq integration
  * exposes).
  *
  *   init <table>                       create the statement table
  *   ingest <table> <jsonl> [<ts>]      FTM entity JSONL → statements
  *   optimize <table>                   compact (FINAL dedup rewrite)
  *   stats <table>                      per dataset/schema counts
  *   query <table> [k=v ...]            dataset=, schema=, limit=,
  *                                      where=prop:op:value (repeat)
  */
object Cli {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, args.toList)
    finally spark.stop()
  }

  private[graft] def run(spark: SparkSession, args: List[String]): Unit =
    args match {
      case "init" :: table :: Nil =>
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS $table (
             |  id STRING, entity_id STRING, canonical_id STRING,
             |  prop STRING, prop_type STRING, schema STRING,
             |  value STRING, last_seen TIMESTAMP, deleted BOOLEAN,
             |  dataset STRING)
             |USING parquet PARTITIONED BY (dataset)
             |CLUSTERED BY (canonical_id) SORTED BY (canonical_id)
             |INTO 64 BUCKETS""".stripMargin)
        println(s"created $table")

      case "ingest" :: table :: path :: rest =>
        val ts = rest.headOption.getOrElse("2026-01-01 00:00:00")
        val stmts = FtmJson.statements(spark, path)
          .withColumn("id",
            md5(concat_ws("|", col("entity_id"), col("prop"), col("value"))))
          .withColumn("last_seen", lit(ts).cast("timestamp"))
          .select("id", "entity_id", "canonical_id", "prop", "prop_type",
            "schema", "value", "last_seen", "dataset")
        // cache so the reported count reuses the batch the write
        // materialized instead of re-parsing the JSONL a second time
        stmts.persist()
        try {
          StatementStore.append(stmts, table)
          println(s"ingested ${stmts.count()} statements into $table")
        } finally stmts.unpersist()

      case "optimize" :: table :: Nil =>
        StatementStore.compact(spark, table)
        println(s"optimized $table")

      case "stats" :: table :: Nil =>
        Statements.stats(StatementStore.readFinal(spark, table))
          .orderBy("dataset", "schema")
          .collect()
          .foreach(r => println(r.mkString("\t")))

      case "query" :: table :: opts =>
        val kv = opts.map(_.split("=", 2)).collect {
          case Array(k, v) => (k, v)
        }
        var q = EntityQuery(StatementStore.readFinal(spark, table))
        kv.foreach {
          case ("dataset", v) => q = q.dataset(v)
          case ("schema", v) => q = q.schema(v)
          case ("where", v) => v.split(":", 3) match {
            case Array(p, op, value) => q = q.where(p, op, value)
            case _ => sys.error(s"where= expects prop:op:value, got $v")
          }
          case ("limit", v) => q = q.slice(0, v.toInt)
          case (k, _) => sys.error(s"unknown option $k")
        }
        q.entities().collect().foreach(r => println(r.mkString("\t")))

      case other =>
        sys.error(s"usage: init|ingest|optimize|stats|query, got: $other")
    }
}
