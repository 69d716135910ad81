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
    // staged projections: the tokenization and the four hit counts are
    // each referenced several times downstream, and codegen's
    // subexpression elimination can't dedup higher-order-function
    // trees — hoisting keeps split+filter at once-per-row
    val withWs = documents.select(col("doc_id"), col("lang"),
      Dedup.words(col("text")).as("ws"))
    val withHits = withWs.select(col("doc_id") +: col("lang") +:
      stopwords.map { case (lang, l) =>
        hits(col("ws"), l).as(s"${lang}_hits") }: _*)
    val Seq(en, de, es, fr) =
      stopwords.map { case (lang, _) => col(s"${lang}_hits") }
    val pred = when(en + de + es + fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))
    withHits.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"))
  }

  /** t2 — quality scoring: length / punctuation / stopword / word-length
    * ratios, the standard cheap pre-filters of a data pipeline.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    // same staging as langId: tokenize once, count once, then derive
    // the ratios from plain attribute references
    val withWs = documents.select(col("doc_id"), col("text"),
      Dedup.words(col("text")).as("ws"))
    val counted = withWs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      size(col("ws")).cast("long").as("n_words"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
        .cast("long").as("n_punct"),
      hits(col("ws"), stopwords.flatMap(_._2).distinct).as("stop_hits"),
      aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w).cast("long"))
        .as("word_len_sum"))
    val nChars = col("n_chars_m"); val nWords = col("n_words")
    counted.select(
      col("doc_id"), nChars.as("n_chars_m"), nWords.as("n_words"),
      col("n_punct").as("n_punct"),
      round(when(nChars > 0, col("n_punct").cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0)), 6).as("punct_ratio"),
      round(when(nWords > 0, col("stop_hits").cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)), 6).as("stopword_ratio"),
      round(when(nWords > 0,
        col("word_len_sum").cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)), 6).as("avg_word_len"))
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
  def docFingerprint(documents: DataFrame): DataFrame =
    documents
      // hoist the shingle build into its own projection: `sh` is used
      // twice below, and inlining would re-evaluate the whole
      // split/concat tree per use (CollapseProject keeps a non-cheap
      // multi-referenced alias materialized)
      .select(col("doc_id"), col("text"),
        Dedup.shingles3(col("text")).as("sh"))
      .select(
        col("doc_id"),
        md5(Dedup.normText(col("text"))).as("content_hash"),
        when(size(col("sh")) > 0,
          array_min(transform(col("sh"), s => md5(s))))
          .otherwise(lit(null).cast("string")).as("min_shingle_hash"))

  /** t5 — benchmark decontamination: corpus documents sharing at least
    * one word n-gram with any probe (benchmark/eval) document, with
    * the distinct overlapping-gram count. The training-pipeline use:
    * drop (or audit) every hit before training so eval text cannot
    * leak into the corpus.
    *
    * Scale shape: grams travel as 60-bit hashes; the probe gram set is
    * benchmark-sized (≪ corpus) so the equi-join broadcasts, and the
    * corpus side is one scan + explode + map-side-combined count —
    * no shuffle ever carries corpus text.
    */
  def contamination(
      corpus: DataFrame, probes: DataFrame, n: Int = 8): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), Dedup.shinglesN(col("text"), n).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("g"))
      .select(col("doc_id"), Dedup.md5Hash60(lit(0), col("g")).as("h"))
    val probeGrams = grams(probes).select(col("h")).distinct()
    grams(corpus).join(probeGrams, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_overlapping"))
  }
}
