package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting.
  *
  * All pure `functions._` expressions — each operator is a single
  * codegen'd scan projection with no shuffle, so throughput is
  * scan-bound at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (function words only). The
    * heuristic: the language whose stopwords hit the most tokens wins;
    * zero hits anywhere → "und" (undetermined).
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "von"),
    "es" -> Seq("el", "los", "las", "es", "y", "que", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "des", "du"))

  private def hits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isin(list.map(lit): _*))).cast("long")

  /** t1 — language ID. Deterministic argmax with fixed preference order
    * en > de > es > fr on ties.
    */
  def langId(documents: DataFrame): DataFrame = {
    val ws = Dedup.words(col("text"))
    val Seq(en, de, es, fr) = stopwords.map { case (_, l) => hits(ws, l) }
    val pred = when(en + de + es + fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
    documents.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"))
  }

  /** t2 — quality scoring: length / punctuation / stopword / word-length
    * ratios, the standard cheap pre-filters of a data pipeline.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val ws = Dedup.words(col("text"))
    val nWords = size(ws).cast("long")
    val nChars = length(col("text")).cast("long")
    val nPunct = (nChars - length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
      .cast("long")
    val stopHits = hits(ws, stopwords.flatMap(_._2).distinct)
    val avgWordLen = when(nWords > 0,
      aggregate(ws, lit(0L), (acc, w) => acc + length(w).cast("long"))
        .cast("double") / nWords.cast("double")).otherwise(lit(0.0))
    documents.select(
      col("doc_id"), nChars.as("n_chars_m"), nWords.as("n_words"),
      nPunct.as("n_punct"),
      round(when(nChars > 0, nPunct.cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0)), 6).as("punct_ratio"),
      round(when(nWords > 0, stopHits.cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)), 6).as("stopword_ratio"),
      round(avgWordLen, 6).as("avg_word_len"))
  }

  /** t3 — token counting: whitespace tokens + a BPE-ish regex token
    * count (letter runs, single digits, single punctuation marks — the
    * shape of a byte-pair pre-tokenizer).
    */
  def tokenCount(documents: DataFrame): DataFrame = {
    val ws = Dedup.words(col("text"))
    documents.select(
      col("doc_id"),
      size(ws).cast("long").as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))
        .cast("long").as("bpe_tokens"))
  }

  /** t4 — document fingerprint: md5 of normalized text (exact identity)
    * plus the minimum shingle hash (content-sketch identity, stable
    * under local edits).
    */
  def docFingerprint(documents: DataFrame): DataFrame = {
    val sh = Dedup.shingles3(col("text"))
    documents.select(
      col("doc_id"),
      md5(Dedup.normText(col("text"))).as("content_hash"),
      when(size(sh) > 0, array_min(transform(sh, s => md5(s))))
        .otherwise(lit(null).cast("string")).as("min_shingle_hash"))
  }
}
