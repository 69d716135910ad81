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
    * zero hits anywhere → "und" (undetermined). The single definition
    * lives in [[graft.functions.WordStatsExpression.languages]] so the
    * native one-pass counter and every composed twin share it.
    */
  val stopwords: Seq[(String, Seq[String])] =
    graft.functions.WordStatsExpression.languages

  private[operators] def hits(ws: Column, list: Seq[String]): Column =
    size(filter(ws, w => w.isin(list.map(lit): _*))).cast("long")

  /** The four-way language argmax with the fixed tie-break preference
    * en > de > es > fr — THE single definition t1 and p1/st11 share
    * (their DuckDB twins replicate it as a CASE in the same order).
    */
  private[operators] def langPred(
      en: Column, de: Column, es: Column, fr: Column): Column =
    when(en + de + es + fr === 0, lit("und"))
      .when(en >= de && en >= es && en >= fr, lit("en"))
      .when(de >= es && de >= fr, lit("de"))
      .when(es >= fr, lit("es"))
      .otherwise(lit("fr"))

  /** t1 — language ID. Deterministic argmax with fixed preference order
    * en > de > es > fr on ties. The four hit counts come from ONE
    * compiled pass ([[graft.functions.WordStatsExpression]] — the
    * composed four-filter form walked the array once per language);
    * the struct is hoisted to its own projection so the argmax's
    * multiple field references stay cheap attribute reads.
    */
  def langId(documents: DataFrame): DataFrame = {
    val withSt = documents.select(col("doc_id"), col("lang"),
      graft.functions.WordStatsExpression.wordStats(
        Dedup.words(col("text"))).as("st"))
    val Seq(en, de, es, fr) =
      stopwords.map { case (lang, _) =>
        col("st").getField(s"${lang}_hits") }
    val pred = langPred(en, de, es, fr)
    withSt.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"))
  }

  /** t1's composed `functions._`-only twin (four interpreted
    * filter+isin passes) — kept for the parity spec.
    */
  private[graft] def langIdComposed(documents: DataFrame): DataFrame = {
    val withWs = documents.select(col("doc_id"), col("lang"),
      Dedup.words(col("text")).as("ws"))
    val withHits = withWs.select(col("doc_id") +: col("lang") +:
      stopwords.map { case (lang, l) =>
        hits(col("ws"), l).as(s"${lang}_hits") }: _*)
    val Seq(en, de, es, fr) =
      stopwords.map { case (lang, _) => col(s"${lang}_hits") }
    val pred = langPred(en, de, es, fr)
    withHits.select(col("doc_id"), col("lang"), pred.as("pred_lang"),
      en.as("en_hits"), de.as("de_hits"), es.as("es_hits"), fr.as("fr_hits"))
  }

  /** The ONE staged projection of the t2/t13 base metrics (tokenize
    * once, count once): n_chars, n_words, n_punct, stop_hits,
    * char_sum, optionally the compiled bigram stats — shared so the
    * quality SCORES (t2) and the quality GATE (t13/p3) can never
    * silently disagree on a metric definition.
    */
  private def countedMetrics(
      documents: DataFrame, carry: Seq[Column],
      withBigrams: Boolean): DataFrame = {
    // ws materializes once and feeds both native passes (codegen's
    // subexpression elimination can't dedup the words() HOF tree, so
    // inlining it into each native call would re-split the text)
    val withWs = documents.select(col("doc_id") +: col("text") +:
      Dedup.words(col("text")).as("ws") +: carry: _*)
    val bg = if (withBigrams)
      Seq(graft.functions.BigramStatsExpression.bigramStats(col("ws"))
        .as("st"))
    else Nil
    val counted = withWs.select(Seq(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^a-z0-9 ]", "")))
        .cast("long").as("n_punct"),
      graft.functions.WordStatsExpression.wordStats(col("ws"))
        .as("wst")) ++ bg ++ carry: _*)
    counted.select(Seq(
      col("doc_id"), col("n_chars"),
      col("wst").getField("n_words").as("n_words"),
      col("n_punct"),
      col("wst").getField("stop_hits").as("stop_hits"),
      col("wst").getField("char_sum").as("char_sum")) ++
      bg.map(_ => col("st")) ++ carry: _*)
  }

  /** The composed twin of [[countedMetrics]]'s word counters (the five
    * interpreted passes the native expression replaces) — kept for the
    * parity spec.
    */
  private[graft] def countedMetricsComposed(
      documents: DataFrame): DataFrame = {
    val withWs = documents.select(col("doc_id"), col("text"),
      Dedup.words(col("text")).as("ws"))
    withWs.select(
      col("doc_id"),
      size(col("ws")).cast("long").as("n_words"),
      hits(col("ws"), stopwords.flatMap(_._2).distinct).as("stop_hits"),
      aggregate(col("ws"), lit(0L),
        (acc, w) => acc + length(w).cast("long")).as("char_sum"))
  }

  /** t2 — quality scoring: length / punctuation / stopword / word-length
    * ratios, the standard cheap pre-filters of a data pipeline.
    */
  def qualityScore(documents: DataFrame): DataFrame = {
    val counted = countedMetrics(documents, Nil, withBigrams = false)
    val nChars = col("n_chars"); val nWords = col("n_words")
    counted.select(
      col("doc_id"), nChars.as("n_chars_m"), nWords.as("n_words"),
      col("n_punct").as("n_punct"),
      round(when(nChars > 0, col("n_punct").cast("double") / nChars.cast("double"))
        .otherwise(lit(0.0)), 6).as("punct_ratio"),
      round(when(nWords > 0, col("stop_hits").cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)), 6).as("stopword_ratio"),
      round(when(nWords > 0,
        col("char_sum").cast("double") / nWords.cast("double"))
        .otherwise(lit(0.0)), 6).as("avg_word_len"))
  }

  /** t13 — Gopher-style quality FILTER: the rule battery of published
    * web-corpus pipelines (Rae et al. 2021's document filters) as one
    * keep/drop decision per document with per-rule verdicts, the step
    * that turns t2/t7's descriptive ratios into an actionable gate.
    * Rules (bounds tuned to this corpus's distributions so every rule
    * discriminates):
    *   - word count within [20, 90]
    *   - mean word length within [4, 5]
    *   - symbol-to-char ratio ≤ 0.1
    *   - at least 2 stopword hits
    *   - duplicate 2-gram ratio ≤ 0.05
    *
    * Every rule is evaluated in EXACT INTEGER arithmetic
    * (`char_sum ≤ 5·n_words` instead of `char_sum/n_words ≤ 5.0`), so
    * there is no float boundary on which engines can disagree — the
    * DuckDB twin reproduces each verdict bit-for-bit.
    *
    * Scale: one codegen'd scan projection (tokenize once, one compiled
    * bigram-stats pass), zero shuffle — the same shape as t2; at 100 TB
    * this is scan-bound and embarrassingly parallel.
    */
  def gopherFilter(
      documents: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val carryCols = carry.map(col)
    val counted = countedMetrics(documents, carryCols, withBigrams = true)
    val staged = counted.select(
      Seq(col("doc_id"), col("n_chars"), col("n_words"), col("n_punct"),
        col("stop_hits"), col("char_sum"),
        col("st").getField("n_grams").as("n_grams"),
        (col("st").getField("n_grams") - col("st").getField("n_distinct"))
          .as("n_dup_grams")) ++ carryCols: _*)
    val rules = Seq(
      "r_word_count" -> col("n_words").between(20L, 90L),
      "r_word_len" -> (col("char_sum") >= col("n_words") * 4L &&
        col("char_sum") <= col("n_words") * 5L),
      "r_symbol" -> (col("n_punct") * 10L <= col("n_chars")),
      "r_stopwords" -> (col("stop_hits") >= 2L),
      "r_repetition" -> (col("n_dup_grams") * 20L <= col("n_grams")))
    val flagged = staged.select(
      Seq(col("doc_id"), col("n_words"), col("char_sum"), col("stop_hits"),
        col("n_grams"), col("n_dup_grams")) ++
        rules.map { case (name, c) => c.as(name) } ++ carryCols: _*)
    flagged.select(
      (flagged.columns.map(col) :+
        rules.map { case (name, _) => col(name) }.reduce(_ && _).as("keep") :+
        rules.map { case (name, _) =>
          when(col(name), lit(0L)).otherwise(lit(1L)) }
          .reduce(_ + _).as("n_failed")): _*)
  }

  /** t16 — the compression-ratio quality gate (the CCNet-era corpus
    * filter): per document, raw UTF-8 bytes, DEFLATE bytes, their
    * ratio, and a two-sided keep verdict — a ratio far BELOW the
    * natural-prose band means boilerplate/repetition (LZ77 eats the
    * repeats: crawler traps, tag soup, keyword stuffing), a ratio at
    * ~1.0 means incompressible bytes (minified/binary/garbled — no
    * language structure to code). Catches the UNSTRUCTURED duplication
    * t7's line detector and t11's passage miner cannot see (sub-line
    * repeats, interleaved boilerplate), with ZERO tokenization.
    *
    * One codegen'd pass ([[graft.functions.DeflateStatsExpression]] —
    * per-thread native zlib state, integer byte counts out); the
    * ratio/verdict arithmetic is declarative on the two counts. The
    * gate compares scaled INTEGERS (deflate·10⁴ vs raw·threshold·10⁴)
    * so keep/drop never depends on float rounding; the reported ratio
    * is round(4) for the human. Scan-local: no exchange, ever.
    */
  def compressionGate(
      documents: DataFrame,
      minRatio: Double = 0.30,
      maxRatio: Double = 0.98): DataFrame = {
    val st = graft.functions.DeflateStatsExpression.deflateStats(col("text"))
    documents
      .select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st").getField("raw_bytes").as("raw_bytes"),
        col("st").getField("deflate_bytes").as("deflate_bytes"))
      .select(col("doc_id"), col("raw_bytes"), col("deflate_bytes"),
        round(col("deflate_bytes").cast("double") / col("raw_bytes"), 4)
          .as("ratio"),
        (col("deflate_bytes") * 10000L >=
            col("raw_bytes") * math.round(minRatio * 10000).toInt &&
          col("deflate_bytes") * 10000L <=
            col("raw_bytes") * math.round(maxRatio * 10000).toInt)
          .as("keep"))
  }

  /** t17 — BM25 ranked retrieval (Robertson–Spärck Jones; k1 = 1.2,
    * b = 0.75): score every document against a term query — the
    * retrieval face next to t8's corpus-wide distinctive terms (t8
    * asks "which terms characterize this source", this asks "which
    * DOCUMENTS answer this query"). Float BM25 can never hash-gate
    * (per-term float sums, engine log), so the whole formula runs
    * integer-exact:
    *   - idf on the q35 nanobit lattice: the Robertson idf's
    *     half-integer ratio (N − df + ½)/(df + ½) is (2N−2df+1)/
    *     (2df+1), so idf_nb = L(2N−2df+1) − L(2df+1) with
    *     L(x) = round(log2(x)·10⁹) — exact integers;
    *   - the tf saturation with k1 = 6/5, b = 3/4 and the corpus
    *     average length as an integer (avgl = W div N, documented
    *     floor) multiplies through to ONE integer division:
    *     term_nb = (idf_nb·22·tf·avgl) div (10·tf·avgl + 3·avgl
    *     + 9·len) — Spark DIV and DuckDB // both TRUNCATE TOWARD
    *     ZERO (identical on both engines; they differ from floor
    *     only on a negative numerator, which both truncate the same
    *     way);
    *   - the document score is the SUM of term_nb — order-free.
    * Negative idf: a term present in MORE than half the documents has
    * idf_nb < 0 and contributes a negative term_nb (Lucene clamps
    * this at 0; the classic Robertson formula, kept here, does not —
    * both engines compute the same signed value, so the gate holds;
    * clamp with greatest(idf_nb, 0) in both if Lucene parity is
    * wanted). Magnitude bound (the lattice MAGNITUDE rule at the
    * Queries doc): idf_nb ≤ 64·10⁹ for any corpus that fits in a
    * signed long — corpus-LOG, not corpus-linear — so the numerator
    * idf_nb·22·tf·avgl stays under 2⁶³ while tf·avgl < ~6.5·10⁶
    * (e.g. tf ≤ 6 500 at avgl = 1 000). That is a DOCUMENT-scale
    * bound, independent of corpus size, and STRUCTURAL since r15: a
    * pathological single document (tf in the millions) REFUSES loudly
    * ([[graft.functions.Lattice.checkedProduct]] on tf·avgl, an
    * overflow-free division-form check inside the same codegen stage)
    * instead of wrapping where DuckDB widens — cap tf or widen
    * through DECIMAL if ingesting unbounded single-document term
    * counts. Plan: one tokenize scan → (doc, term) tf
    * aggregate; df and the two corpus totals are term-grain /
    * 1-row — both broadcast; final doc-grain sum.
    */
  private[graft] val bm25MaxTfAvgl = 6500000L // 2^63 / (22 * 64e9)

  def bm25(documents: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    def nanobits(c: Column): Column = round(log(2.0, c) * 1e9).cast("long")
    val withWords = documents
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .select(col("doc_id"), col("ws"), size(col("ws")).cast("long").as("len"))
    val totals = withWords.agg(
      count(lit(1)).as("n_docs"), sum(col("len")).as("n_words"))
    val tf = withWords
      .select(col("doc_id"), col("len"), explode(col("ws")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("len"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(broadcast(df), "term")
      .crossJoin(broadcast(totals))
      .withColumn("avgl", expr("n_words DIV n_docs"))
      .withColumn("idf_nb",
        nanobits(lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)) -
          nanobits(lit(2) * col("df") + lit(1)))
      // refuse-loudly magnitude guard: idf_nb·22·tf·avgl must stay
      // under 2^63, i.e. tf·avgl < ~6.5e6 (idf_nb ≤ 64e9 structurally)
      .withColumn("tf", graft.functions.Lattice.checkedProduct(
        col("tf"), col("avgl"), bm25MaxTfAvgl,
        "t17 bm25: tf*avgl, idf_nb*22*tf*avgl < 2^63"))
      .withColumn("term_nb", expr(
        "(idf_nb * 22 * tf * avgl) DIV (10 * tf * avgl + 3 * avgl + 9 * len)"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_hits"), sum(col("term_nb")).as("score_nb"))
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

  /** t3b — REAL BPE token counts ([[graft.functions.Bpe]]): greedy
    * ranked-merge encoding over a trained merges table, replacing t3's
    * regex APPROXIMATION of a byte-pair tokenizer with the actual
    * algorithm — the count that makes d10 token budgets, t12 packing
    * manifests, and p2 shard sizes exact for a real subword tokenizer
    * (feed this frame's `bpe_tokens` as their token column).
    *
    * mapPartitions, deliberately not an Expression/UDF: the merge loop
    * is data-dependent iteration over a driver-trained vocabulary with
    * a per-partition WORD MEMO (natural text repeats words, so the
    * loop runs once per distinct word per partition) — stateful
    * imperative work outside codegen's reach, and the documented
    * last-resort case. Scale shape: one scan, zero shuffles, the
    * merges table broadcast once (vocabulary-sized, the s2
    * hyperplane-matrix class).
    */
  def bpeTokenCount(
      documents: DataFrame,
      merges: IndexedSeq[(String, String)] =
        graft.functions.Bpe.defaultMerges): DataFrame = {
    import graft.functions.Bpe
    val spark = documents.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val vocab = new Bpe.Vocab(bc.value)
        val memo = scala.collection.mutable.HashMap.empty[String, Int]
        it.map { case (id, t) => (id, Bpe.countTokens(t, vocab, memo)) }
      }
      .toDF("doc_id", "bpe_tokens")
  }

  /** t15 — tokenize to IDS: the training-data deliverable t3b only
    * counts — every document as an id sequence under a corpus-derived
    * subword vocabulary. Two stages:
    *
    *   1. VOCAB BUILD — one token-grain aggregation over the encoded
    *      corpus, ids assigned by (count desc, token asc). The collect
    *      is the documented BOUNDED class at any corpus size: a
    *      greedy-merge encoder can only emit single characters or one
    *      of the |merges| trained merge outputs, so |vocab| ≤
    *      |alphabet| + |merges| — a model artifact, not corpus-sized
    *      (spec-asserted).
    *   2. APPLY — scan-local re-encode + id lookup through the
    *      broadcast map, with the t3b per-partition distinct-word
    *      memo. The RETURNED plan is a pure scan projection: zero
    *      shuffles, the vocab job having run eagerly at build time
    *      (the d12/d13 discipline for two-pass operators).
    *
    * Tokens outside the map (an external vocab applied to a drifted
    * corpus) emit id −1 so coverage gaps are visible, never silent;
    * on the same-corpus face the spec asserts none occur.
    */
  def bpeTokenize(
      documents: DataFrame,
      merges: IndexedSeq[(String, String)] =
        graft.functions.Bpe.defaultMerges): DataFrame = {
    import graft.functions.Bpe
    val spark = documents.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(merges)
    val counts = documents.select(col("text")).as[String]
      .mapPartitions { it =>
        val vocab = new Bpe.Vocab(bc.value)
        val memo =
          scala.collection.mutable.HashMap.empty[String, Vector[String]]
        it.flatMap { t =>
          Bpe.preTokens(t)
            .flatMap(w => memo.getOrElseUpdate(w, vocab.encode(w)))
        }
      }
      .groupBy(col("value")).count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // The bound that licenses this collect, enforced AT the collect: a
    // greedy-merge encoder emits only single characters or trained merge
    // outputs, so |vocab| ≤ |alphabet| + |merges| — model-sized, never
    // corpus-sized. A violating token means the encoder contract broke;
    // refuse loudly rather than ship an unbounded driver-side map.
    locally {
      val mergeOuts = merges.iterator.map { case (a, b) => a + b }.toSet
      val rogue = counts.iterator
        .map(_._1).find(t => t.length > 1 && !mergeOuts.contains(t))
      require(rogue.isEmpty,
        s"bpeTokenize vocab bound violated: token '${rogue.get}' is " +
          "neither a single character nor a trained merge output " +
          s"(|vocab|=${counts.length}, |merges|=${merges.length})")
    }
    val ids: Map[String, Long] = counts
      .sortBy { case (tok, n) => (-n, tok) }
      .zipWithIndex.map { case ((tok, _), i) => tok -> i.toLong }
      .toMap
    val bcIds = spark.sparkContext.broadcast(ids)
    documents.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val vocab = new Bpe.Vocab(bc.value)
        val idOf = bcIds.value
        val memo =
          scala.collection.mutable.HashMap.empty[String, Array[Long]]
        it.map { case (id, t) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Long]
          Bpe.preTokens(t).foreach { w =>
            out ++= memo.getOrElseUpdate(w,
              vocab.encode(w).map(tok => idOf.getOrElse(tok, -1L)).toArray)
          }
          (id, out.length.toLong, out.toArray)
        }
      }
      .toDF("doc_id", "n_tokens", "ids")
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
    * no shuffle ever carries corpus text. The gram hashing itself is
    * ONE compiled pass per document
    * ([[graft.functions.NgramHashesExpression]]); the composed
    * shingle-then-hash form is kept as [[hashedGramsComposed]], the
    * spec-asserted parity twin (n−1 interpreted zip_with walks +
    * per-gram expression md5 — 4.3s vs ~1s at sf0.1).
    *
    * When the distinct probe gram set outgrows broadcast comfort, a
    * BLOOM FILTER over the probe gram hashes is planted in the corpus
    * gram stream — corpus grams are pruned inside the scan stage,
    * before any join moves them, and the exact equi-join then removes
    * the false positives, so the answer is bit-identical either way
    * (spec-asserted). The gate (`bloom = None`) reuses the OPTIMIZER'S
    * own decision inputs: the probe grams' estimated size against the
    * session's broadcast threshold — zero extra jobs, and the bloom
    * engages exactly where the probe join stops being a broadcast (in
    * the broadcast regime the hash join already filters in the same
    * codegen stage, so a bloom there is pure overhead). The
    * probe-gram count that sizes the filter is only paid once the
    * large-probe regime is entered.
    */
  /** The ONE definition of contamination gram hashing (tokenizer +
    * n-gram + seed), shared by batch [[contamination]] and the
    * streaming guard ([[graft.streaming.Streams.contaminationStream]])
    * so their parity cannot drift from a one-sided tweak (r8 review).
    */
  private[graft] def gramHashesCol(n: Int): Column =
    graft.functions.NgramHashesExpression.ngramHashes(
      Dedup.words(col("text")), n, seed = 0)

  def contamination(
      corpus: DataFrame, probes: DataFrame, n: Int = 8,
      bloom: Option[Boolean] = None, bloomFpp: Double = 0.01): DataFrame = {
    def grams(df: DataFrame): DataFrame = df
      .select(col("doc_id"), explode(gramHashesCol(n)).as("h"))
    val probeGrams = grams(probes).select(col("h")).distinct()
    val corpusGrams = grams(corpus)
    val engage = bloom.getOrElse {
      val conf = corpus.sparkSession.sessionState.conf
      conf.autoBroadcastJoinThreshold <= 0 ||
        probeGrams.queryExecution.optimizedPlan.stats.sizeInBytes >
          BigInt(conf.autoBroadcastJoinThreshold)
    }
    val pruned =
      if (!engage) corpusGrams
      else {
        // the engaged regime is BY DEFINITION the large-probe one, so
        // (a) the distinct probe-gram aggregation is persisted for
        // EXACTLY the two eager driver-side jobs that need it (the
        // sizing count materializes the cache, the bloom aggregation
        // reads it) and unpersisted before the lazy plan is returned —
        // both because a persist that outlives the call leaks cache on
        // a long-running cluster, and because Spark's cache manager
        // would substitute the InMemoryRelation into ANY later plan
        // containing the same probe-gram sub-plan, silently changing
        // its shape (an AQE-cached relation hides its output
        // partitioning, forcing re-shuffles downstream). The final
        // join recomputes the distinct once — two computations total,
        // down from three, with the returned plan cache-free;
        // (b) the filter is CAPPED at 2^26 bits (8 MB, Spark's own
        // runtime-bloom ceiling) — an uncapped optimal-size bloom over
        // ~1e9 grams is ~1.2 GB allocated per aggregation task,
        // shuffled, collected, and then serialized into every
        // corpus-scan task as a plan literal. Past the cap the fpp
        // degrades instead of the memory: the exact equi-join below
        // removes every false positive either way, so the answer is
        // bit-identical — the bloom only loses pruning power, never
        // correctness.
        probeGrams.persist()
        val filter =
          try {
            val items = math.max(probeGrams.count(), 1L)
            val maxBits = 1L << 26
            val optimal = org.apache.spark.util.sketch.BloomFilter
              .optimalNumOfBits(items, bloomFpp)
            probeGrams.stat.bloomFilter(
              "h", items, math.min(optimal, maxBits))
          } finally {
            probeGrams.unpersist(blocking = false)
            ()
          }
        val bytes = new java.io.ByteArrayOutputStream()
        filter.writeTo(bytes)
        corpusGrams.filter(org.apache.spark.sql.GraftSqlBridge.column(
          org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
            org.apache.spark.sql.catalyst.expressions.Literal.create(
              bytes.toByteArray,
              org.apache.spark.sql.types.BinaryType),
            org.apache.spark.sql.GraftSqlBridge.expression(col("h")))))
      }
    pruned.join(probeGrams, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("h")).as("n_overlapping"))
  }

  /** The composed `functions._`-only twin of the native gram hashing
    * inside [[contamination]]: distinct n-shingles via chained
    * zip_with, then the seeded 60-bit md5 per gram. Value- AND
    * order-identical to `NgramHashesExpression` (both emit distinct
    * grams in first-occurrence order).
    */
  def hashedGramsComposed(df: DataFrame, n: Int): DataFrame = df
    .select(col("doc_id"),
      transform(Dedup.shinglesNComposed(col("text"), n),
        g => Dedup.md5Hash60(lit(0), g)).as("hs"))

  /** PII patterns, shared between detection and redaction. Written in
    * the common Java-regex/RE2 subset so the DuckDB oracle executes the
    * IDENTICAL pattern (no lookarounds, no backreferences).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    // (name, pattern, replacement) — redaction applies IN THIS ORDER:
    // emails first (a phone-shaped digit run inside an email local
    // part must not survive as a phone hit), then IPs, then phones
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** t6 — PII scrubbing: per-pattern match counts (on the raw text)
    * plus the redacted text with every match replaced by its tag.
    * Pure scan projection — the redaction a 100 TB pipeline runs over
    * every document exactly once, no shuffle.
    */
  def piiScrub(documents: DataFrame): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("long").as(s"n_$name")
    }
    val clean = piiPatterns.foldLeft(col("text")) {
      case (acc, (_, pat, repl)) => regexp_replace(acc, pat, repl)
    }
    documents.select(
      (col("doc_id") +: counts :+ clean.as("clean_text")): _*)
  }

  /** t7 — intra-document repetition (the Gopher-style quality signal:
    * heavily self-repeating documents are boilerplate/spam): over the
    * document's word 2-grams WITH multiplicity, the fraction that are
    * duplicates and the share of the single most frequent 2-gram.
    *
    * Entirely scan-local, no shuffle: the grams never explode into
    * rows — all three stats come from ONE compiled hash-count pass per
    * document ([[graft.functions.BigramStatsExpression]]). The composed
    * higher-order-function form ([[repetitionComposed]]) is kept as the
    * value-parity twin; it does three interpreted walks of the gram
    * array (distinct, sort, fold) and benched 8.8s vs ~1s native at
    * sf0.1.
    */
  def repetition(documents: DataFrame): DataFrame =
    repetitionFrom(documents,
      graft.functions.BigramStatsExpression.bigramStats(
        Dedup.words(col("text"))))

  /** t7's composed `functions._`-only twin (spec-asserted equal to
    * [[repetition]]): n_distinct via `array_distinct`, top gram count
    * via a fold over the SORTED gram array (equal grams are adjacent
    * after sorting, so the longest run IS the max multiplicity).
    */
  def repetitionComposed(documents: DataFrame): DataFrame = {
    val ws = Dedup.words(col("text"))
    val grams = when(size(ws) >= 2,
      transform(sequence(lit(0), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))
    val maxRun = aggregate(
      array_sort(col("grams")),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, g) => {
        val run = when(g === acc("prev"), acc("run") + 1L).otherwise(lit(1L))
        struct(g.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
    val stats = documents
      .select(col("doc_id"), grams.as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_distinct(col("grams"))).cast("long").as("n_distinct"),
        maxRun.as("top_count"))
    ratios(stats)
  }

  /** Shared tail: stats struct column → the t7 output schema. */
  private def repetitionFrom(documents: DataFrame, st: Column): DataFrame =
    ratios(documents
      // hoist the struct: referenced three times below; inlining would
      // re-run the whole hash pass per reference
      .select(col("doc_id"), st.as("st"))
      .select(col("doc_id"),
        col("st").getField("n_grams").as("n_grams"),
        col("st").getField("n_distinct").as("n_distinct"),
        col("st").getField("top_count").as("top_count")))

  private def ratios(stats: DataFrame): DataFrame =
    stats
      .select(col("doc_id"), col("n_grams"), col("n_distinct"),
        round(when(col("n_grams") > 0,
          (col("n_grams") - col("n_distinct")).cast("double") /
            col("n_grams").cast("double")).otherwise(lit(0.0)), 6)
          .as("dup_ratio"),
        round(when(col("n_grams") > 0,
          col("top_count").cast("double") / col("n_grams").cast("double"))
          .otherwise(lit(0.0)), 6).as("top_gram_ratio"))

  /** t8 — distinctive terms per source, by LIFT: how over-represented a
    * term's document frequency is inside the source relative to the
    * whole corpus, `(a/ds) / (g/N)` for a = source docs containing the
    * term, ds = source docs, g = corpus docs containing it, N = corpus
    * docs. The TF-IDF-flavored corpus-exploration view ("what
    * vocabulary is peculiar to this domain?") and the feed for
    * domain-tag features. Cross-engine determinism: every division is
    * one correctly-rounded binary64 over exact integers, so the DuckDB
    * twin ranks identical values; ties break on the term.
    *
    * Scale shape: tokens dedup per document in the scan (array_distinct
    * before explode), so the exploded stream carries each (doc, term)
    * once; the aggregations are map-side combinable; term-level totals
    * attach via a window inside the one term-grain exchange (never a
    * vocabulary-sized broadcast — that rollup GROWS with the corpus);
    * only the structurally-bounded source counts and the 1-row total
    * broadcast; the final top-k window ranks vocabulary-sized groups
    * (counts, not documents), so a source with a billion documents
    * still ranks over only its distinct terms.
    */
  def distinctiveTerms(documents: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docTerms = documents
      .select(col("doc_id"), col("source"),
        explode(array_distinct(Dedup.words(col("text")))).as("term"))
    val bySourceTerm = docTerms
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("n_docs"))
    // term-level totals are a WINDOW over the (source, term) counts,
    // not a rollup-and-join-back: the rollup is vocabulary-sized — the
    // one "small side" here whose row count GROWS with the corpus
    // (hundreds of millions of distinct terms in a 100 TB web crawl,
    // past any broadcast budget), and a join-back would shuffle the
    // same vocabulary-sized rows a second time. The window attaches
    // g and n_sources in the ONE term-grain exchange, structurally —
    // no broadcast to outgrow, no planner reuse to hope for.
    // ((source, term) is unique after the groupBy, so count(*) over
    // the term partition IS the distinct-source count.)
    val wTerm = Window.partitionBy(col("term"))
    val withTermStats = bySourceTerm
      .withColumn("g", sum(col("n_docs")).over(wTerm))
      .withColumn("n_sources", count(lit(1)).over(wTerm))
    // bySource (one row per source) and total (one row) stay
    // hint-broadcast — those small sides ARE structurally bounded
    val bySource = documents.groupBy(col("source"))
      .agg(count(lit(1)).as("ds"))
    val total = documents.agg(count(lit(1)).as("n_total"))
    val lift = (col("n_docs").cast("double") / col("ds").cast("double")) /
      (col("g").cast("double") / col("n_total").cast("double"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("lift").desc, col("term"))
    withTermStats
      .join(broadcast(bySource), Seq("source"))
      .crossJoin(broadcast(total))
      .withColumn("lift", lift)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("source"), col("term"), col("n_docs"), col("n_sources"),
        round(col("lift"), 6).as("lift"), col("rank"))
  }

  /** t10 — unigram-LM surprisal: per-document average −ln p(term)
    * under the corpus's own unigram model — the deterministic stand-in
    * for the LM-perplexity quality filters (CCNet-style) a training
    * pipeline runs: boilerplate and template text score LOW (frequent
    * terms), gibberish and OCR noise score HIGH (rare terms), and both
    * tails get reviewed before training.
    *
    * Scale shape — the t8 lesson applied: corpus term frequencies are
    * vocabulary-sized (they GROW with the corpus), so they attach via
    * a window inside the one term-grain exchange, never a rollup that
    * is joined or broadcast back; the corpus token total is ONE row
    * and stays a broadcast. Two shuffles total (term grain, then doc
    * grain re-assembly), both map-side combinable.
    */
  def unigramSurprisal(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = documents.select(col("doc_id"),
      explode(Dedup.words(col("text"))).as("term"))
    // count(*) over the term partition = corpus term frequency,
    // attached to every occurrence inside the term exchange
    val tf = toks.withColumn("tf",
      count(lit(1)).over(Window.partitionBy(col("term"))))
    // The 1-row token total re-derives from toks (a second scan +
    // tokenize, map-side-combined to a few bytes of shuffle). The
    // tempting avg(−ln(tf/T)) = avg(−ln tf) + ln T rewrite — deriving
    // T from the doc-grain aggregate so "nothing scans twice" — was
    // MEASURED and rejected: Spark does not reuse the duplicated
    // aggregate subtree (0 ReusedExchange in the executed plan, AQE
    // included), so that form re-runs the full term-grain WINDOW stage
    // twice — the whole token stream shuffled again — to save a scan.
    // Duplicating the scan+explode is the cheaper redundancy; the
    // window exchange stays paid exactly once.
    val total = toks.agg(count(lit(1)).as("n_total_tokens"))
    tf.crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        round(avg(-log(col("tf").cast("double") /
          col("n_total_tokens").cast("double"))), 6).as("surprisal"))
  }

  /** t14 — bigram-LM surprisal: per-document average −ln p(w₂|w₁)
    * under the corpus's own bigram model with add-one smoothing —
    * t10's unigram filter at the next model order, the deterministic
    * stand-in for the KenLM-perplexity gate of CCNet (Wenzek et al.
    * 2020): unigram surprisal scores a document by WHICH words it
    * uses; bigram surprisal scores HOW they are put together, so
    * shuffled/concatenated boilerplate with common words (which t10
    * passes) scores high here, and both tails get reviewed. p(w₂|w₁) =
    * (c(w₁w₂) + 1) / (c(w₁·) + V) — Laplace smoothing over the corpus
    * vocabulary, so unseen continuations stay finite and the score is
    * exactly reproducible cross-engine (no backoff weights to drift).
    * Documents with fewer than two tokens have no bigram and drop out.
    *
    * Scale shape — the t8/t10 rule plus one new trick: bigram pair
    * formation is SCAN-LOCAL (the word array zipped with its own
    * tail — no posexplode/self-join, no window over positions), and
    * both corpus-frequency attachments ride ONE bigram-grain exchange:
    * the c(w₁·) window partitions by w1, and the c(w₁w₂) window's
    * (w1, w2) clustering is SATISFIED by that same hash(w1)
    * partitioning (a superset clustering needs no new Exchange — the
    * planner inserts only a sort), so the vocabulary²-sized bigram
    * frequencies attach with zero joins, zero broadcasts, and one
    * shuffle. The 1-row vocabulary count V re-derives from a second
    * scan (the measured t10 trade: duplicating scan+tokenize beats
    * re-shuffling the token stream) and stays a broadcast.
    */
  def bigramSurprisal(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = documents.select(col("doc_id"),
      Dedup.words(col("text")).as("ws"))
    val pairs = ws
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("ws"), lit(1), greatest(size(col("ws")) - 1, lit(0)))
          .as("w1"),
        slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0)))
          .as("w2"))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    // c1 FIRST (hash(w1) exchange), then c12 — hash(w1) clusters
    // (w1, w2) too, so the second window adds only a sort
    val counted = pairs
      .withColumn("c1",
        count(lit(1)).over(Window.partitionBy(col("w1"))))
      .withColumn("c12",
        count(lit(1)).over(Window.partitionBy(col("w1"), col("w2"))))
    val vocab = documents
      .select(explode(Dedup.words(col("text"))).as("term"))
      .agg(countDistinct(col("term")).as("v"))
    counted.crossJoin(broadcast(vocab))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(avg(-log((col("c12").cast("double") + lit(1.0)) /
          (col("c1").cast("double") + col("v").cast("double")))), 6)
          .as("surprisal"))
  }

  /** t11 — repeated-passage mining: every word `n`-gram that appears in
    * at least `minDocs` DISTINCT documents, with its document count and
    * the smallest doc_id containing it. The discovery phase of
    * substring-level deduplication (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better") and the memorization audit a
    * training pipeline runs: a passage repeated across many documents
    * is boilerplate the model will memorize verbatim.
    *
    * Reported passages are the `maxPassages` MOST-REPEATED ones
    * (n_docs desc, hash asc tiebreak) — the audit is a top-N report,
    * and the cap is what makes the text-recovery join scale-safe (see
    * below); set it to the report size you will actually read.
    *
    * Scale shape: the counting pass moves only 60-bit gram hashes —
    * `graft_ngram_hashes` emits each doc's DISTINCT grams in one
    * compiled scan pass (so count(*) per hash IS the document
    * frequency), and the aggregate is map-side combinable. The
    * survivor top-K is a per-partition top-K merge (TakeOrdered), not
    * a global sort. Passage TEXT re-enters only from the EXAMPLE
    * documents: a semi-join on the ≤ maxPassages example ids prunes
    * the recovery scan to ≤ maxPassages documents before any gram
    * string is built (the first version re-shingled the WHOLE corpus
    * to recover text and benched 7.4× on 10× rows; this shape is the
    * fix), and the final join's build side is the survivor table
    * itself. Both broadcast hints are STRUCTURALLY bounded by the cap
    * (the t8 rule: only hint-broadcast what is bounded by
    * construction — without the hint the planner was measured building
    * the corpus gram-text side). The survivor subtree feeds both the
    * semi-join and the final join; its shuffle is planned once and
    * reused (ReusedExchange, spec-pinned via the shuffle ceiling). The
    * passage is recovered as the min matching gram OF THE EXAMPLE DOC
    * — in both engines — so a 60-bit collision changes both sides
    * identically and cross-engine parity cannot drift on it.
    */
  def dupPassages(
      documents: DataFrame, n: Int = 8, minDocs: Long = 2,
      maxPassages: Int = 10000): DataFrame =
    dupPassagesByHash(documents, n, minDocs, maxPassages)
      .select(col("passage"), col("n_docs"), col("example_doc_id"))

  /** [[dupPassages]] keyed by the 60-bit gram hash — the form the
    * scrub's candidate equi-join needs ([[passageScrub]]).
    */
  def dupPassagesByHash(
      documents: DataFrame, n: Int = 8, minDocs: Long = 2,
      maxPassages: Int = 10000): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    require(minDocs >= 2, s"minDocs must be at least 2, got $minDocs")
    require(maxPassages > 0, s"maxPassages must be positive, got $maxPassages")
    val survivors = documents
      .select(col("doc_id"), explode(gramHashesCol(n)).as("h"))
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("example_doc_id"))
      .filter(col("n_docs") >= minDocs)
      .orderBy(col("n_docs").desc, col("h"))
      .limit(maxPassages)
    val exampleDocs = documents.join(
      broadcast(survivors.select(col("example_doc_id").as("doc_id"))),
      Seq("doc_id"), "left_semi")
    val gramText = exampleDocs
      .select(col("doc_id").as("gdoc"),
        explode(Dedup.shinglesN(col("text"), n)).as("g"))
      .select(col("gdoc"), Dedup.md5Hash60(lit(0), col("g")).as("h"),
        col("g"))
    // rename the survivor-side join keys: both subtrees scan the same
    // table, and dataset-column references across a self-join are
    // ambiguous to the analyzer
    gramText.join(broadcast(survivors.withColumnRenamed("h", "sh")),
      col("h") === col("sh") && col("gdoc") === col("example_doc_id"))
      .groupBy(col("sh"), col("n_docs"), col("example_doc_id"))
      .agg(min(col("g")).as("passage"))
      .select(col("sh").as("h"), col("passage"), col("n_docs"),
        col("example_doc_id"))
  }

  /** d11 — repeated-passage scrub: the APPLICATION step of t11's
    * mining (Lee et al. 2022 substring dedup, the boilerplate-removal
    * face): every passage t11 surfaces (a word n-gram appearing in ≥
    * `minDocs` documents) is removed from every document that holds
    * it as a WORD-ALIGNED gram — the grain the mining counted; a doc
    * containing the passage only as a mid-word substring is not a
    * holder of the mined gram and is left alone (within a candidate
    * doc, `replace` then removes every literal occurrence). Each
    * removal leaves a single space. Output per doc: chars removed +
    * the hash of the scrubbed text (the hash proves the exact scrub
    * to the oracle without re-shipping the corpus).
    *
    * Scale shape — fold only what can match, move no text: a naive
    * fold of every doc over the full passage list is
    * O(maxPassages × doc length) character scanning per document
    * (measured minutes at sf0.1 with the 10k cap), and a join-back of
    * per-doc candidate lists would shuffle the corpus text on doc_id.
    * Instead the CAPPED survivor set (≤ `maxPassages`, structurally
    * bounded) aggregates into ONE row as a sorted hash array,
    * broadcast to every task; each document finds its candidate
    * passages scan-locally — its own distinct grams whose hash binary-
    * searches into the probe (native
    * [[graft.functions.SortedContainsExpression]]; `array_contains`
    * would linear-scan the 10k probe per gram). A matching gram IS the
    * passage text (same 60-bit hash ⇒ same normalized gram string), so
    * no hash→text map rides along. The fold then applies just those
    * candidates (typically a handful, sorted — overlap resolution
    * stays deterministic). The scrub operates on the NORMALIZED text
    * (lowercase, single-spaced — `Dedup.normText`), the same form the
    * mining tokenized: every mined passage occurs literally there BY
    * CONSTRUCTION, so "removed from every document" actually holds on
    * mixed-case/whitespace corpora (a raw-text replace would silently
    * miss case/spacing variants of the gram — and the oracle, making
    * the same mistake, would never catch it). Document text never
    * shuffles; the only movement is the mining subtree's hashes.
    */
  def passageScrub(
      documents: DataFrame, n: Int = 8, minDocs: Long = 2,
      maxPassages: Int = 10000): DataFrame = {
    val probe = dupPassagesByHash(documents, n, minDocs, maxPassages)
      .agg(array_sort(collect_list(col("h"))).as("hs"))
    val candidates = array_sort(filter(Dedup.shinglesN(col("text"), n),
      g => graft.functions.SortedContainsExpression.sortedContains(
        Dedup.md5Hash60(lit(0), g), col("hs"))))
    documents.join(broadcast(probe))
      .select(col("doc_id"), Dedup.normText(col("text")).as("norm"),
        aggregate(coalesce(candidates, array()),
          Dedup.normText(col("text")),
          (acc, p) => replace(acc, p, lit(" "))).as("clean"))
      .select(col("doc_id"),
        (length(col("norm")) - length(col("clean"))).cast("long")
          .as("n_chars_removed"),
        md5(col("clean")).as("clean_hash"))
  }

  /** t9 — context-window chunking: split each document into fixed-size
    * token windows with overlap (`stride` < `chunkTokens` overlaps
    * consecutive chunks by `chunkTokens - stride` tokens), the standard
    * prep step that turns variable-length documents into
    * training-sequence-sized pieces. Chunk starts are 0, stride,
    * 2·stride, … while < n_tokens; a document shorter than one window
    * yields a single short chunk; an empty document yields none.
    *
    * Scale: `sequence` + `explode` inside one scan projection — zero
    * shuffle, and rows only ever fan OUT (each task keeps its own
    * documents' chunks), so throughput stays scan-bound at any corpus
    * size. The token array is built once per row and sliced per chunk;
    * chunk count per doc is ⌈n/stride⌉, so output size is
    * ~(chunkTokens/stride)× the corpus — the caller's overlap choice,
    * not an engine blow-up.
    */
  def chunk(documents: DataFrame, chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(stride > 0 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens], got $stride")
    val withWs = documents.select(col("doc_id"),
      Dedup.words(col("text")).as("ws"))
    val n = size(col("ws"))
    // sequence() needs start <= stop for ascending steps; the n = 0
    // case gets an empty array, which explode() then drops entirely.
    // A start > 0 whose window adds NOTHING beyond the previous one is
    // dropped: the chunk at s covers tokens (s, min(s+chunk, n)], the
    // one before it reaches min(s − stride + chunk, n), so s is
    // redundant exactly when n ≤ s + (chunk − stride) — without the
    // filter every doc with n mod stride in (0, chunk − stride] emits
    // a tail chunk FULLY CONTAINED in its predecessor, i.e. a
    // training-sequence prep operator that injects duplicates (r8
    // review).
    val overlap = chunkTokens - stride
    val starts = when(n > lit(0),
      filter(sequence(lit(0), n - lit(1), lit(stride)),
        s => s === 0 || s + lit(overlap) < n))
      .otherwise(array().cast("array<int>"))
    withWs
      .select(col("doc_id"), col("ws"), explode(starts).as("start"))
      .select(col("doc_id"),
        // starts are exact multiples of stride, so double division is
        // exact here; cast to long for the engine-portable schema
        (col("start") / lit(stride)).cast("long").as("chunk_idx"),
        array_join(slice(col("ws"), col("start") + lit(1),
          lit(chunkTokens)), " ").as("chunk_text"),
        least(lit(chunkTokens), size(col("ws")) - col("start"))
          .cast("long").as("n_chunk_tokens"))
  }
}
