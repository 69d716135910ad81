package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table access for the graft engine.
  *
  * The reference stores everything in ClickHouse MergeTree tables
  * (/root/reference/ftm_columnstore/engine.py:130). On Spark the
  * equivalent storage primitive is partitioned parquet read through the
  * DataSource V2 scan: Catalyst pushes predicates and prunes columns, so
  * the ClickHouse skip-indexes/projections have no direct analogue —
  * they fall out of partitioning + min/max stats.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. `dir` is an sf directory like
    * /root/testdata/sf0.01.
    *
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as
    * a nanosecond LONG (`spark.sql.legacy.parquet.nanosAsLong=true`,
    * set by GraftSession/Verify/Bench); we normalize it back to a
    * microsecond TIMESTAMP here so operators see a real time column.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
}
