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
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
