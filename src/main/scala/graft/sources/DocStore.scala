package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The document corpus as a managed table WITH its near-dup index —
  * the INCREMENTAL dedup storage pattern that sits between batch d3
  * (re-block the whole corpus) and the st12 stream guard (per-event
  * state): a daily ingest asks "which stored documents are near-dup
  * candidates of this new batch?" and the answer must not reshuffle —
  * or even move — the corpus.
  *
  * Two tables, written together:
  *
  *   - `<table>`: the documents, BUCKETED BY doc_id — point lookups
  *     and the FINAL dedup-by-id read are in-bucket, and the text
  *     bytes land spread evenly.
  *   - `<table>_bands`: the MinHash-LSH band-key index
  *     (doc_id, band, key) — one row per (doc, band), computed by the
  *     SAME fused words→shingles→signature→bands kernel as batch d3
  *     and streaming st12, so all three faces flag identical
  *     candidates. Narrow columns only; text never enters the index.
  *
  * [[append]] double-inserts docs AND their band keys in one call
  * (the st8/FpxStore discipline) so normal operation never drifts
  * them; a crash BETWEEN the two writes can — see [[append]] for why
  * the index-first order makes that state loud rather than silently
  * lossy, and [[compact]] for the durable repair.
  *
  * The probe ([[nearDupCandidates]]) broadcasts the NEW batch's band
  * keys onto one scan of the stored index: the corpus side never
  * shuffles and its text is never read — at 100 TB the ingest-batch
  * dedup costs one narrow 3-column index scan plus a candidate-pair
  * shuffle bounded by the BATCH, not the corpus. Hot band keys
  * (boilerplate shingles shared by millions of stored docs) are
  * excluded by the same maxBucket cutoff as batch d3, counted only
  * over keys the batch actually probes.
  */
object DocStore {

  /** Append a document batch and its band-key index rows. The INDEX
    * lands first: the two writes are not atomic, and the two possible
    * crash states are not symmetric — orphan index rows (index landed,
    * docs did not) can only produce candidates that die loudly at the
    * text-verification join, while missing index rows (docs landed,
    * index did not) are SILENT false negatives on every later probe.
    * [[compact]] rebuilds the index from the deduped docs, repairing
    * either drift durably.
    */
  def append(
      docs: DataFrame,
      table: String,
      numHashes: Int = 12,
      rowsPerBand: Int = 2,
      buckets: Int = 64): Unit = {
    bandKeys(docs, numHashes, rowsPerBand).write
      .mode(SaveMode.Append)
      .bucketBy(buckets, "band", "key")
      .sortBy("band", "key")
      .format("parquet")
      .saveAsTable(s"${table}_bands")
    docs.write
      .mode(SaveMode.Append)
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .format("parquet")
      .saveAsTable(table)
  }

  /** The ONE band-key projection all faces of the store share. */
  private def bandKeys(
      docs: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame =
    docs
      .filter(size(Dedup.words(col("text"))) >= 3)
      .select(col("doc_id"), posexplode(
        graft.functions.MinHashSignatureExpression.minhashBands(
          Dedup.words(col("text")), 3, numHashes, rowsPerBand)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("key"))

  /** Raw read — may contain duplicate doc_ids from re-ingests. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** FINAL read: one row per doc_id (any survivor — re-ingested docs
    * are byte-identical). In-bucket dedup, no Exchange.
    */
  def readFinal(spark: SparkSession, table: String): DataFrame =
    read(spark, table).dropDuplicates("doc_id")

  /** The stored index. */
  def bands(spark: SparkSession, table: String): DataFrame =
    spark.table(s"${table}_bands")

  /** Near-dup candidates of `newDocs` against the STORED corpus:
    * (stored_doc_id, new_doc_id) pairs sharing at least one band key,
    * each pair once. The new batch's keys are hint-broadcast — an
    * ingest batch is ingest-sized, the exact regime where t5
    * broadcasts its probe set — so the stored index scans once
    * through a broadcast hash join with no corpus-side shuffle.
    * Keys matching more than `maxBucket` DISTINCT stored docs are
    * excluded (batch d3's blocking cutoff; at 100 TB a boilerplate
    * key is otherwise an unbounded fan-out), with the count taken
    * only over probed keys. Self-matches (a doc already stored being
    * re-probed) are excluded by id.
    */
  def nearDupCandidates(
      spark: SparkSession,
      table: String,
      newDocs: DataFrame,
      numHashes: Int = 12,
      rowsPerBand: Int = 2,
      maxBucket: Int = 1000): DataFrame = {
    // Materialize the batch's band keys ONCE: the projection feeds two
    // plan subtrees (the broadcast distinct key set and the final
    // join), and without the checkpoint each subtree recomputes the
    // batch MinHash signatures — twice the kernel work, and an
    // inconsistent key set if newDocs is backed by a non-deterministic
    // source. Batch-sized, so the eager materialization is cheap.
    val probe = bandKeys(newDocs, numHashes, rowsPerBand)
      .withColumnRenamed("doc_id", "new_doc_id")
      .localCheckpoint()
    val stored = bands(spark, table)
    val hits = stored.join(
      broadcast(probe.select(col("band"), col("key")).distinct()),
      Seq("band", "key"))
    // cutoff over probed keys only, through the SAME guarded set-build
    // as d3/f8 ([[graft.operators.Fpx.boundedMemberSets]]): its keyed
    // repartition lets the sketch pass and the set build share one
    // Exchange (ReuseExchange), so the stored index is scanned ONCE —
    // a hand-rolled guard here was measured planning the scan twice.
    // min = 1: a stored doc alone on a probed key still pairs with the
    // batch doc that probed it (pairs are stored×new, never stored×
    // stored).
    val bounded = graft.operators.Fpx.boundedMemberSets(
      hits, Seq("band", "key"), "doc_id", 1, maxBucket)
      .select(col("band"), col("key"), explode(col("ids")).as("doc_id"))
    bounded
      .join(probe, Seq("band", "key"))
      .filter(col("doc_id") =!= col("new_doc_id"))
      .select(col("doc_id").as("stored_doc_id"), col("new_doc_id"))
      .distinct()
  }

  /** Durable dedup of both tables via the shared staged swap
    * ([[TableSwap]] crash-window policy): documents dedup by id, the
    * index rebuilds FROM the deduped documents so compaction also
    * repairs any index drift.
    */
  def compact(
      spark: SparkSession,
      table: String,
      numHashes: Int = 12,
      rowsPerBand: Int = 2,
      buckets: Int = 64): Unit = {
    val docsTmp = TableSwap.stageName(spark, table)
    TableSwap.dropAllStages(spark, table)
    TableSwap.dropAllStages(spark, s"${table}_bands")
    val finalDocs = readFinal(spark, table)
    finalDocs.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "doc_id")
      .sortBy("doc_id")
      .format("parquet")
      .saveAsTable(docsTmp)
    TableSwap.swapIn(spark, docsTmp, table, partitioned = false)(df =>
      df.write.mode(SaveMode.Append).bucketBy(buckets, "doc_id")
        .sortBy("doc_id").format("parquet").saveAsTable(table))
    val bandsTmp = TableSwap.stageName(spark, s"${table}_bands")
    bandKeys(read(spark, table), numHashes, rowsPerBand).write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, "band", "key")
      .sortBy("band", "key")
      .format("parquet")
      .saveAsTable(bandsTmp)
    TableSwap.swapIn(spark, bandsTmp, s"${table}_bands",
      partitioned = false)(df =>
      df.write.mode(SaveMode.Append).bucketBy(buckets, "band", "key")
        .sortBy("band", "key").format("parquet")
        .saveAsTable(s"${table}_bands"))
  }
}
