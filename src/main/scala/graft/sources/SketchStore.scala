package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Kmv
import graft.operators.Dedup

/** Continuous corpus-cardinality telemetry: per-source K-Minimum-Values
  * sketches ([[graft.functions.Kmv]], the q25 aggregate) maintained
  * across micro-batches — "how many distinct shingles has each source
  * contributed, ever" answered at any moment without a corpus rescan.
  * The streaming face is st18 ([[graft.streaming.Streams
  * .sketchCardinality]]).
  *
  * The store is a versioned append table `(source, sk, ver)` — the
  * [[XrefStore]] `_mapping` discipline at sketch grain:
  *
  *   - each micro-batch appends ONE batch-grain sketch row per source
  *     it touched (one aggregation over the batch, ≤ k longs per row);
  *   - reads fold all versions per source: the k smallest of the union
  *     of k-min sets IS the k-min set of the union (KMV mergeability),
  *     so the fold — flatten → distinct → sort → slice k — equals the
  *     sketch a single pass over the full history would have built;
  *   - the fold is IDEMPOTENT in batches: a replayed micro-batch
  *     (at-least-once delivery, checkpoint restart) appends rows whose
  *     hashes the union already contains — set union absorbs them, so
  *     served estimates cannot drift under replay. Counter-based
  *     cardinality state (counts, HLL registers added naively) does
  *     not have this property; it is WHY the state is a value-hash
  *     SET and not a counter;
  *   - [[compact]] folds history to one row per source via the
  *     staged-location swap (readable throughout, crash-safe) — the
  *     OPTIMIZE face that bounds fold-at-read cost on long streams.
  *
  * 100 TB shape: per-batch work is one bounded aggregation; state per
  * source is ≤ (batches-since-compact) × k longs, compacted back to
  * k; nothing driver-side ever holds a sketch.
  */
object SketchStore {

  /** Shingle width shared with q25's registry face (and its oracle). */
  val shingleN = 3

  private def write(df: DataFrame, table: String, mode: SaveMode): Unit =
    df.write.format("parquet").mode(mode).saveAsTable(table)

  /** Fold a batch of documents into the sketch table: one sketch row
    * per (source, batch). Batches are the unit of replay, so `ver`
    * carries the batchId purely for observability — correctness never
    * depends on it (the fold is a set union).
    */
  def applyBatch(
      spark: SparkSession, batch: DataFrame, table: String, k: Int,
      batchId: Long): Unit = {
    val rows = batch
      .select(col("source"),
        explode(Dedup.shinglesN(col("text"), shingleN)).as("g"))
      .groupBy(col("source"))
      .agg(Kmv.kmvSketch(col("g"), k).as("sk"))
      .withColumn("ver", lit(batchId))
    if (!spark.catalog.tableExists(table)) write(rows, table, SaveMode.ErrorIfExists)
    else write(rows, table, SaveMode.Append)
  }

  /** The folded sketch per source: k-min of the union of every
    * appended sketch row (= the sketch of the full history, by KMV
    * mergeability). collect_list state per source is bounded by
    * (batches since compact) × k — [[compact]] re-bounds it.
    */
  def foldSketches(spark: SparkSession, table: String, k: Int): DataFrame = {
    // the stream's foreachBatch appends from a CLONED session — an
    // observer session's cached file listing goes stale between
    // batches; refresh is metadata-only and makes reads current
    spark.catalog.refreshTable(table)
    spark.table(table)
      .groupBy(col("source"))
      .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))),
        1, k).as("sk"))
  }

  /** Serving face: the live distinct estimate per source. */
  def readEstimates(spark: SparkSession, table: String, k: Int): DataFrame =
    foldSketches(spark, table, k)
      .select(col("source"),
        Kmv.distinctEstimate(col("sk"), k).as("distinct_shingles"))

  /** OPTIMIZE: fold history to one row per source (ver = max seen),
    * via the staged-location swap — reads stay live, a crash strands
    * only a stage directory, appends landing mid-compact are replayed
    * in by the swap's append-back. Idempotent: compacting a compacted
    * table rewrites the same single row per source.
    */
  def compact(spark: SparkSession, table: String, k: Int): Unit = {
    spark.catalog.refreshTable(table) // see foldSketches
    val maxRow = spark.table(table).agg(max(col("ver"))).collect()(0)
    if (maxRow.isNullAt(0)) return // zero-row table: nothing to fold
    val maxVer = maxRow.getLong(0)
    val folded = foldSketches(spark, table, k).withColumn("ver", lit(maxVer))
      .select(col("source"), col("sk"), col("ver"))
    val tmp = TableSwap.stageName(spark, table)
    TableSwap.dropAllStages(spark, table)
    write(folded, tmp, SaveMode.ErrorIfExists)
    TableSwap.swapIn(spark, tmp, table, partitioned = false)(df =>
      write(df, table, SaveMode.Append))
  }
}
