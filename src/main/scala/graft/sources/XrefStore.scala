package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Xref

/** The xref judgement table as a Spark-managed table — the analogue of
  * the reference's `..._xref` `ReplacingMergeTree(ts) ORDER BY
  * (left_id, right_id)` (engine.py:176-203) with its `_reverse`
  * projection (engine.py:259-261).
  *
  * Layout: main table BUCKETED BY left_id, sorted (left_id, right_id)
  * — the FINAL window partitions by the pair key, and a hash
  * partitioning on a subset (left_id) of the partition keys satisfies
  * the window's required clustering, so judgement upserts resolve with
  * ZERO Exchange (spec-asserted). A ClickHouse projection is a second
  * physically-sorted copy maintained on insert; the analogue here is a
  * sibling `<table>_reverse` bucketed by right_id, written by the same
  * [[append]] — reverse lookups ("who matched against X") become
  * bucket-pruned point reads instead of full scans. Same 2× insert
  * cost as the reference's projection, same read win.
  */
object XrefStore {

  def reverseTable(table: String): String = table + "_reverse"

  /** Append judgement rows to the main table AND the reverse
    * projection (one insert maintains both, like ClickHouse does for
    * projections on insert).
    */
  def append(xref: DataFrame, table: String, buckets: Int = 64): Unit = {
    xref.select(Xref.columns.map(col): _*).write
      .mode(SaveMode.Append)
      .bucketBy(buckets, "left_id")
      .sortBy("left_id", "right_id")
      .format("parquet")
      .saveAsTable(table)
    Xref.reverse(xref).write
      .mode(SaveMode.Append)
      .bucketBy(buckets, "right_id")
      .sortBy("right_id", "left_id")
      .format("parquet")
      .saveAsTable(reverseTable(table))
  }

  /** Raw read — may contain superseded judgement rows. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** FINAL read: the latest judgement per (left_id, right_id) —
    * ReplacingMergeTree(ts). In-bucket window, no Exchange.
    */
  def readLatest(spark: SparkSession, table: String): DataFrame =
    Xref.latestJudgements(read(spark, table))

  /** Reverse lookup via the projection table: all latest judgements
    * whose RIGHT side is the given entity. The equi-filter prunes to
    * one bucket of `<table>_reverse`; the FINAL window then runs over
    * that bucket only (keyed (left_id, right_id) exactly like the main
    * table — the projection holds the same rows reordered).
    */
  def lookupByRight(
      spark: SparkSession, table: String, rightId: String): DataFrame =
    Xref.latestJudgements(
      spark.table(reverseTable(table)).filter(col("right_id") === rightId))
}
