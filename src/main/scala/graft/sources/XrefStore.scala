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

  /** The one physical layout per side; every write path (append,
    * compact stage, swap fallback) goes through here so main and
    * reverse bucketing can never diverge.
    */
  private def write(
      df: DataFrame, table: String, bucketCol: String,
      sortCols: Seq[String], buckets: Int, mode: SaveMode): Unit =
    df.write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  private def writeMain(
      df: DataFrame, table: String, buckets: Int, mode: SaveMode): Unit =
    write(df.select(Xref.columns.map(col): _*), table,
      "left_id", Seq("left_id", "right_id"), buckets, mode)

  private def writeReverse(
      reversed: DataFrame, table: String, buckets: Int, mode: SaveMode): Unit =
    write(reversed, table, "right_id", Seq("right_id", "left_id"),
      buckets, mode)

  /** Append judgement rows to the main table AND the reverse
    * projection (one insert maintains both, like ClickHouse does for
    * projections on insert).
    */
  def append(xref: DataFrame, table: String, buckets: Int = 64): Unit = {
    writeMain(xref, table, buckets, SaveMode.Append)
    writeReverse(Xref.reverse(xref), reverseTable(table), buckets,
      SaveMode.Append)
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

  /** Durable judgement dedup — the `OPTIMIZE FINAL` analogue for the
    * xref family (engine.optimize, engine.py:117-125): rewrite the
    * main table with [[readLatest]] applied, then rebuild the
    * `_reverse` projection FROM the compacted main table (so the
    * projection can never drift from the rows it projects). Each table
    * is written exactly ONCE to a versioned stage sibling and swapped
    * in by [[TableSwap.swapIn]]'s single SET LOCATION — the same
    * no-absent-window pattern as [[StatementStore.compact]], fallbacks
    * included.
    */
  def compact(spark: SparkSession, table: String, buckets: Int = 64): Unit = {
    val tmp = TableSwap.stageName(spark, table)
    TableSwap.dropAllStages(spark, table)
    writeMain(readLatest(spark, table), tmp, buckets, SaveMode.Overwrite)
    TableSwap.swapIn(spark, tmp, table, partitioned = false)(df =>
      writeMain(df, table, buckets, SaveMode.Append))
    // [[compact]] swaps main THEN `_reverse`; a crash between the two
    // swaps leaves the reverse projection one compaction behind main.
    // That staleness is row-level harmless — both tables hold the same
    // upsert-keyed rows and every read path reapplies the FINAL window
    // — and re-running compact is the repair. (The per-table swap
    // itself has no absent-name window; policy in [[TableSwap]].)
    val rev = reverseTable(table)
    val rtmp = TableSwap.stageName(spark, rev)
    TableSwap.dropAllStages(spark, rev)
    // reverse = projection of the already-compacted main: a cheap
    // bucket-local parquet re-read, no second FINAL computation
    writeReverse(Xref.reverse(read(spark, table)), rtmp, buckets,
      SaveMode.Overwrite)
    TableSwap.swapIn(spark, rtmp, rev, partitioned = false)(df =>
      writeReverse(df, rev, buckets, SaveMode.Append))
  }
}
