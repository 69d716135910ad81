package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** p1 — the end-to-end training-data preprocess as ONE query: language
  * gate → quality gate → exact dedup → stratified mix rebalance, the
  * standard pipeline a corpus runs before tokenization (the per-stage
  * operators t1/t2/d1/d7 exist standalone; this is their composition a
  * real user actually executes).
  *
  * Shape at 100 TB — one scan, one shuffle:
  *  - every per-doc signal (stopword hits per language, quality
  *    counters, content hash, BPE token count) computes in a single
  *    scan projection; the tokenization (`Dedup.words`) is hoisted so
  *    the split runs once per row, not once per signal;
  *  - the cheap gates (language, quality) filter BEFORE the dedup
  *    window, so only surviving compact signal rows — never text —
  *    reach the one shuffle (the content-hash window; same 1-exchange
  *    form as [[Dedup.exact]]);
  *  - the stratified keep test is a scan-local deterministic hash
  *    filter ([[Sampling.stratified]]) — zero additional movement.
  *
  * Dedup-after-gates also changes semantics deliberately: a document
  * only counts as a duplicate if it survived the gates, so `n_dups` is
  * "surviving copies", and the canonical representative is the smallest
  * surviving doc_id — the order real pipelines use (filter cheap,
  * dedup what remains).
  */
object Preprocess {

  def select(
      documents: DataFrame,
      minStopwordRatio: Double = 0.02,
      maxPunctRatio: Double = 0.3,
      rates: Map[String, Double] = Map("en" -> 0.5),
      defaultRate: Double = 1.0): DataFrame = {
    val gated = scoredGated(documents, minStopwordRatio, maxPunctRatio)
    val w = Window.partitionBy(col("content_hash"))
    val deduped = gated
      .withColumn("canonical_doc_id", min(col("doc_id")).over(w))
      .withColumn("n_dups", count(lit(1)).over(w))
      .filter(col("doc_id") === col("canonical_doc_id"))
    Sampling.stratified(deduped, col("pred_lang"), col("doc_id"),
      rates, defaultRate)
      .select(col("doc_id"), col("lang"), col("pred_lang"),
        col("stopword_ratio"), col("punct_ratio"),
        col("bpe_tokens"), col("n_dups"))
  }

  /** The stateless front of the pipeline — signal projection + gates —
    * shared by the batch form above and the streaming twin
    * ([[graft.streaming.Streams.preprocessStream]]): everything here is
    * a per-row computation, so it runs identically over a static frame
    * or a micro-batch. `carry` names extra input columns to keep (the
    * stream carries its event-time column through for the watermark).
    */
  private[graft] def scoredGated(
      documents: DataFrame,
      minStopwordRatio: Double,
      maxPunctRatio: Double,
      carry: Seq[String] = Nil): DataFrame = {
    val carried = carry.map(col)
    // ONE compiled pass computes every word counter (per-language hits,
    // all-stopword hits, n_words) — the composed form walked the word
    // array six times through interpreted HOFs per row
    val staged = documents.select(Seq(col("doc_id"), col("lang"),
      col("text"), graft.functions.WordStatsExpression.wordStats(
        Dedup.words(col("text"))).as("wst")) ++ carried: _*)
    val sigs = staged.select(Seq(
      col("doc_id"), col("lang"),
      md5(Dedup.normText(col("text"))).as("content_hash"),
      length(col("text")).cast("long").as("n_chars"),
      col("wst").getField("n_words").as("n_words"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
        .cast("long").as("n_punct"),
      col("wst").getField("stop_hits").as("stop_hits"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
        .cast("long").as("bpe_tokens")) ++
      TextAnalysis.stopwords.map { case (l, _) =>
        col("wst").getField(s"${l}_hits").as(s"${l}_hits") } ++
      carried: _*)
    val Seq(en, de, es, fr) =
      TextAnalysis.stopwords.map { case (l, _) => col(s"${l}_hits") }
    val pred = TextAnalysis.langPred(en, de, es, fr)
    val scored = sigs.select(Seq(
      col("doc_id"), col("lang"), col("content_hash"), col("bpe_tokens"),
      pred.as("pred_lang"),
      round(when(col("n_chars") > 0,
        col("n_punct").cast("double") / col("n_chars").cast("double"))
        .otherwise(lit(0.0)), 6).as("punct_ratio"),
      round(when(col("n_words") > 0,
        col("stop_hits").cast("double") / col("n_words").cast("double"))
        .otherwise(lit(0.0)), 6).as("stopword_ratio")) ++ carried: _*)
    scored.filter(
      col("pred_lang") =!= "und" &&
        col("stopword_ratio") >= minStopwordRatio &&
        col("punct_ratio") <= maxPunctRatio)
  }
}
