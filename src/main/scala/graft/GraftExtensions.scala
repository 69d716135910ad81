package graft

import org.apache.spark.sql.{Column, GraftSqlBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BigramStatsExpression, DeflateStatsExpression,
  DotProductExpression,
  DoubleMetaphoneExpression, Kmv, KmvDistinctAggregate,
  KmvSketchAggregate, MetaphoneExpression,
  MinHashBandsExpression, MinHashSignatureExpression,
  MinHashWordsExpression, NgramHashesExpression, Phonetics,
  ShinglesExpression, SimHashExpression, TokenHashesExpression,
  TopKAggregate, TopKWeightedAggregate, VectorSumAggregate,
  WindowFunnelAggregate, WordStatsExpression}

/** The SQL-function surface: every graft function a pure-SQL user
  * needs, as (identifier, info, builder) triples — injected at
  * config time by [[GraftExtensions]] or registered into a live
  * session with [[GraftFunctionRegistry.registerAll]].
  *
  *   - native expressions: `graft_metaphone`, `graft_double_metaphone`,
  *     `graft_minhash(arr[, numHashes])`, `graft_minhash_words`,
  *     `graft_minhash_bands`,
  *     `graft_simhash(arr)`, `graft_fingerprint`, `graft_fpx_tokens`,
  *     `graft_shingles`, `graft_ngram_hashes`, `graft_token_hashes`,
  *     `graft_bigram_stats`, `graft_word_stats`, `graft_top_k`,
  *     `graft_vec_sum`, `graft_vec_dot`
  */
object GraftFunctionRegistry {

  private def composed(name: String)(f: Column => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier(name),
    new ExpressionInfo(Phonetics.getClass.getName, name),
    { children: Seq[Expression] =>
      require(children.size == 1, s"$name takes one argument")
      GraftSqlBridge.catalystExpression(f(GraftSqlBridge.column(children.head)))
    })

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (MetaphoneExpression.identifier, MetaphoneExpression.info,
      MetaphoneExpression.builder),
    (DoubleMetaphoneExpression.identifier, DoubleMetaphoneExpression.info,
      DoubleMetaphoneExpression.builder),
    composed("graft_fingerprint")(Phonetics.fingerprint),
    composed("graft_fpx_tokens")(Phonetics.fpxTokens),
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(
        classOf[MinHashSignatureExpression].getName, "graft_minhash"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr) => MinHashSignatureExpression(arr, 64)
          case Seq(arr, Literal(n: Int, IntegerType)) =>
            MinHashSignatureExpression(arr, n)
          case _ => throw new IllegalArgumentException(
            "graft_minhash(arr[, numHashes: int literal])")
        }
      }),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(
        classOf[SimHashExpression].getName, "graft_simhash"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_simhash takes one argument")
        SimHashExpression(children.head)
      }),
    (FunctionIdentifier("graft_top_k"),
      new ExpressionInfo(
        classOf[TopKAggregate].getName, "graft_top_k"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(k: Int, IntegerType)) =>
            TopKAggregate(v, k, 4096).toAggregateExpression()
          case Seq(v, Literal(k: Int, IntegerType),
              Literal(cap: Int, IntegerType)) =>
            TopKAggregate(v, k, cap).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_top_k(value, k: int literal[, capacity: int literal])")
        }
      }),
    (FunctionIdentifier("graft_kmv_distinct"),
      new ExpressionInfo(
        classOf[KmvDistinctAggregate].getName, "graft_kmv_distinct"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(k: Int, IntegerType)) =>
            KmvDistinctAggregate(v, k).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_kmv_distinct(value, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_kmv_sketch"),
      new ExpressionInfo(
        classOf[KmvSketchAggregate].getName, "graft_kmv_sketch"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(k: Int, IntegerType)) =>
            KmvSketchAggregate(v, k).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_kmv_sketch(value, k: int literal)")
        }
      }),
    // r13 — the stored-sketch ALGEBRA in plain SQL: fold persisted
    // sketch rows (graft_kmv_union aggregate), merge two sketches
    // (graft_kmv_union2), and estimate distinct/Jaccard/intersection
    // from stored sketches without rescanning either corpus — the
    // d15-style audit composes as one SQL statement.
    (FunctionIdentifier("graft_kmv_union"),
      new ExpressionInfo(
        classOf[graft.functions.KmvUnionAggregate].getName,
        "graft_kmv_union"),
      { children: Seq[Expression] =>
        children match {
          case Seq(sk, Literal(k: Int, IntegerType)) =>
            graft.functions.KmvUnionAggregate(sk, k)
              .toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_kmv_union(sketch: array<bigint>, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_kmv_union2"),
      new ExpressionInfo(Kmv.getClass.getName, "graft_kmv_union2"),
      { children: Seq[Expression] =>
        children match {
          case Seq(a, b, Literal(k: Int, IntegerType)) =>
            GraftSqlBridge.catalystExpression(Kmv.unionSketch(
              GraftSqlBridge.column(a), GraftSqlBridge.column(b), k))
          case _ => throw new IllegalArgumentException(
            "graft_kmv_union2(a, b, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_kmv_estimate"),
      new ExpressionInfo(Kmv.getClass.getName, "graft_kmv_estimate"),
      { children: Seq[Expression] =>
        children match {
          case Seq(sk, Literal(k: Int, IntegerType)) =>
            GraftSqlBridge.catalystExpression(
              Kmv.distinctEstimate(GraftSqlBridge.column(sk), k))
          case _ => throw new IllegalArgumentException(
            "graft_kmv_estimate(sketch, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_kmv_jaccard"),
      new ExpressionInfo(Kmv.getClass.getName, "graft_kmv_jaccard"),
      { children: Seq[Expression] =>
        children match {
          case Seq(a, b, Literal(k: Int, IntegerType)) =>
            GraftSqlBridge.catalystExpression(Kmv.jaccardEstimate(
              GraftSqlBridge.column(a), GraftSqlBridge.column(b), k))
          case _ => throw new IllegalArgumentException(
            "graft_kmv_jaccard(a, b, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_kmv_intersect"),
      new ExpressionInfo(Kmv.getClass.getName, "graft_kmv_intersect"),
      { children: Seq[Expression] =>
        children match {
          case Seq(a, b, Literal(k: Int, IntegerType)) =>
            GraftSqlBridge.catalystExpression(Kmv.intersectEstimate(
              GraftSqlBridge.column(a), GraftSqlBridge.column(b), k))
          case _ => throw new IllegalArgumentException(
            "graft_kmv_intersect(a, b, k: int literal)")
        }
      }),
    // r13 — the stored-QUANTILE algebra in plain SQL (the KLL sibling
    // of the graft_kmv_* family): sketch a BIGINT column, fold stored
    // sketch rows, rank-select quantiles and ranks from stored
    // sketches without rescanning the corpus.
    (FunctionIdentifier("graft_quantile_sketch"),
      new ExpressionInfo(
        classOf[graft.functions.KllSketchAggregate].getName,
        "graft_quantile_sketch"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(k: Int, IntegerType)) =>
            graft.functions.KllSketchAggregate(v, k).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_quantile_sketch(value: bigint, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_quantile_merge"),
      new ExpressionInfo(
        classOf[graft.functions.KllMergeAggregate].getName,
        "graft_quantile_merge"),
      { children: Seq[Expression] =>
        children match {
          case Seq(sk, Literal(k: Int, IntegerType)) =>
            graft.functions.KllMergeAggregate(sk, k).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_quantile_merge(sketch: array<bigint>, k: int literal)")
        }
      }),
    (FunctionIdentifier("graft_quantile_value"),
      new ExpressionInfo(
        classOf[graft.functions.KllValueExpression].getName,
        "graft_quantile_value"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          "graft_quantile_value(sketch, p: double)")
        graft.functions.KllValueExpression(children.head, children(1))
      }),
    (FunctionIdentifier("graft_quantile_rank"),
      new ExpressionInfo(
        classOf[graft.functions.KllRankExpression].getName,
        "graft_quantile_rank"),
      { children: Seq[Expression] =>
        require(children.size == 2,
          "graft_quantile_rank(sketch, v: bigint)")
        graft.functions.KllRankExpression(children.head, children(1))
      }),
    // r13 — the EXACT-bitmap set algebra in plain SQL (the q33
    // family; the exact sibling of graft_kmv_*): build, fold, count,
    // intersect and subtract compressed id bitmaps.
    (FunctionIdentifier("graft_bitmap"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapAggregate].getName, "graft_bitmap"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_bitmap(value: bigint)")
        graft.functions.BitmapAggregate(children.head)
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bitmap_or"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapOrAggregate].getName,
        "graft_bitmap_or"),
      { children: Seq[Expression] =>
        require(children.size == 1,
          "graft_bitmap_or(bitmap: array<bigint>)")
        graft.functions.BitmapOrAggregate(children.head)
          .toAggregateExpression()
      }),
    (FunctionIdentifier("graft_bitmap_count"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapCountExpression].getName,
        "graft_bitmap_count"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_bitmap_count(bitmap)")
        graft.functions.BitmapCountExpression(children.head)
      }),
    (FunctionIdentifier("graft_bitmap_and_count"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapAndCountExpression].getName,
        "graft_bitmap_and_count"),
      { children: Seq[Expression] =>
        require(children.size == 2, "graft_bitmap_and_count(a, b)")
        graft.functions.BitmapAndCountExpression(children.head, children(1))
      }),
    (FunctionIdentifier("graft_bitmap_andnot"),
      new ExpressionInfo(
        classOf[graft.functions.BitmapAndNotExpression].getName,
        "graft_bitmap_andnot"),
      { children: Seq[Expression] =>
        require(children.size == 2, "graft_bitmap_andnot(a, b)")
        graft.functions.BitmapAndNotExpression(children.head, children(1))
      }),
    (FunctionIdentifier("graft_decayed_sum"),
      new ExpressionInfo(
        classOf[graft.functions.DecayedSumExpression].getName,
        "graft_decayed_sum"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(shift: Int, IntegerType)) =>
            graft.functions.DecayedSumExpression(v, shift)
          case _ => throw new IllegalArgumentException(
            "graft_decayed_sum(value: bigint, shift: int literal) " +
              "OVER (PARTITION BY … ORDER BY …)")
        }
      }),
    (FunctionIdentifier("graft_window_funnel"),
      new ExpressionInfo(
        classOf[WindowFunnelAggregate].getName, "graft_window_funnel"),
      { children: Seq[Expression] =>
        children match {
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(w: Long, org.apache.spark.sql.types.LongType)) =>
            WindowFunnelAggregate(ts, step, n, w).toAggregateExpression()
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(w: Int, IntegerType)) =>
            WindowFunnelAggregate(ts, step, n, w.toLong)
              .toAggregateExpression()
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(w: Long, org.apache.spark.sql.types.LongType),
              Literal(strict: Boolean,
                org.apache.spark.sql.types.BooleanType)) =>
            WindowFunnelAggregate(ts, step, n, w, strict)
              .toAggregateExpression()
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(w: Int, IntegerType),
              Literal(strict: Boolean,
                org.apache.spark.sql.types.BooleanType)) =>
            WindowFunnelAggregate(ts, step, n, w.toLong, strict)
              .toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_window_funnel(ts_us, step, n_steps: int literal, " +
              "window_us: long literal[, strict_increase: bool literal])")
        }
      }),
    (FunctionIdentifier("graft_uniq_upto"),
      new ExpressionInfo(
        classOf[graft.functions.UniqUpToAggregate].getName,
        "graft_uniq_upto"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, Literal(n: Int, IntegerType)) =>
            graft.functions.UniqUpToAggregate(v, n).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_uniq_upto(value, n: int literal)")
        }
      }),
    (FunctionIdentifier("graft_top_k_merge"),
      new ExpressionInfo(
        classOf[graft.functions.TopKMergeAggregate].getName,
        "graft_top_k_merge"),
      { children: Seq[Expression] =>
        children match {
          case Seq(sk, Literal(k: Int, IntegerType)) =>
            graft.functions.TopKMergeAggregate(sk, k, 4096)
              .toAggregateExpression()
          case Seq(sk, Literal(k: Int, IntegerType),
              Literal(cap: Int, IntegerType)) =>
            graft.functions.TopKMergeAggregate(sk, k, cap)
              .toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_top_k_merge(summary, k: int literal" +
              "[, capacity: int literal])")
        }
      }),
    (FunctionIdentifier("graft_sequence_match"),
      new ExpressionInfo(
        classOf[graft.functions.SequenceMatchAggregate].getName,
        "graft_sequence_match"),
      { children: Seq[Expression] =>
        children match {
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(g: Long, org.apache.spark.sql.types.LongType)) =>
            graft.functions.SequenceMatchAggregate(ts, step, n, g)
              .toAggregateExpression()
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(g: Int, IntegerType)) =>
            graft.functions.SequenceMatchAggregate(ts, step, n, g.toLong)
              .toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_sequence_match(ts_us, step, n_steps: int literal, " +
              "gap_us: long literal)")
        }
      }),
    (FunctionIdentifier("graft_sequence_count"),
      new ExpressionInfo(
        classOf[graft.functions.SequenceCountAggregate].getName,
        "graft_sequence_count"),
      { children: Seq[Expression] =>
        children match {
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(g: Long, org.apache.spark.sql.types.LongType)) =>
            graft.functions.SequenceCountAggregate(ts, step, n, g)
              .toAggregateExpression()
          case Seq(ts, step, Literal(n: Int, IntegerType),
              Literal(g: Int, IntegerType)) =>
            graft.functions.SequenceCountAggregate(ts, step, n, g.toLong)
              .toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_sequence_count(ts_us, step, n_steps: int literal, " +
              "gap_us: long literal)")
        }
      }),
    (FunctionIdentifier("graft_top_k_weighted"),
      new ExpressionInfo(
        classOf[TopKWeightedAggregate].getName, "graft_top_k_weighted"),
      { children: Seq[Expression] =>
        children match {
          case Seq(v, w, Literal(k: Int, IntegerType)) =>
            TopKWeightedAggregate(v, w, k, 4096).toAggregateExpression()
          case Seq(v, w, Literal(k: Int, IntegerType),
              Literal(cap: Int, IntegerType)) =>
            TopKWeightedAggregate(v, w, k, cap).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_top_k_weighted(value, weight, k: int literal" +
              "[, capacity: int literal])")
        }
      }),
    (FunctionIdentifier("graft_word_stats"),
      new ExpressionInfo(
        classOf[WordStatsExpression].getName, "graft_word_stats"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_word_stats takes one argument")
        WordStatsExpression(children.head)
      }),
    (FunctionIdentifier("graft_lttb"),
      new ExpressionInfo(
        classOf[graft.functions.LttbAggregate].getName, "graft_lttb"),
      { children: Seq[Expression] =>
        children match {
          case Seq(t, v, Literal(n: Int, IntegerType)) =>
            graft.functions.LttbAggregate(t, v, n).toAggregateExpression()
          case _ => throw new IllegalArgumentException(
            "graft_lttb(t, v, n_out: int literal)")
        }
      }),
    (FunctionIdentifier("graft_deflate_stats"),
      new ExpressionInfo(
        classOf[DeflateStatsExpression].getName, "graft_deflate_stats"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_deflate_stats takes one argument")
        DeflateStatsExpression(children.head)
      }),
    (FunctionIdentifier("graft_vec_sum"),
      new ExpressionInfo(
        classOf[VectorSumAggregate].getName, "graft_vec_sum"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_vec_sum takes one argument")
        VectorSumAggregate(children.head)
      }),
    (FunctionIdentifier("graft_minhash_words"),
      new ExpressionInfo(
        classOf[MinHashWordsExpression].getName, "graft_minhash_words"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr, Literal(n: Int, IntegerType),
              Literal(k: Int, IntegerType)) =>
            MinHashWordsExpression(arr, n, k)
          case _ => throw new IllegalArgumentException(
            "graft_minhash_words(arr, n: int literal, numHashes: int literal)")
        }
      }),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(
        classOf[MinHashBandsExpression].getName, "graft_minhash_bands"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr, Literal(n: Int, IntegerType),
              Literal(k: Int, IntegerType), Literal(r: Int, IntegerType)) =>
            MinHashBandsExpression(arr, n, k, r)
          case _ => throw new IllegalArgumentException(
            "graft_minhash_bands(arr, n: int literal, numHashes: int " +
              "literal, rowsPerBand: int literal)")
        }
      }),
    (FunctionIdentifier("graft_token_hashes"),
      new ExpressionInfo(
        classOf[TokenHashesExpression].getName, "graft_token_hashes"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr, Literal(s: Int, IntegerType)) =>
            TokenHashesExpression(arr, s)
          case _ => throw new IllegalArgumentException(
            "graft_token_hashes(arr, seed: int literal)")
        }
      }),
    (FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(
        classOf[ShinglesExpression].getName, "graft_shingles"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr, Literal(n: Int, IntegerType)) =>
            ShinglesExpression(arr, n)
          case _ => throw new IllegalArgumentException(
            "graft_shingles(arr, n: int literal)")
        }
      }),
    (FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(
        classOf[NgramHashesExpression].getName, "graft_ngram_hashes"),
      { children: Seq[Expression] =>
        children match {
          case Seq(arr, Literal(n: Int, IntegerType),
              Literal(s: Int, IntegerType)) =>
            NgramHashesExpression(arr, n, s)
          case _ => throw new IllegalArgumentException(
            "graft_ngram_hashes(arr, n: int literal, seed: int literal)")
        }
      }),
    (FunctionIdentifier("graft_bigram_stats"),
      new ExpressionInfo(
        classOf[BigramStatsExpression].getName, "graft_bigram_stats"),
      { children: Seq[Expression] =>
        require(children.size == 1, "graft_bigram_stats takes one argument")
        BigramStatsExpression(children.head)
      }),
    (FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(
        classOf[DotProductExpression].getName, "graft_vec_dot"),
      { children: Seq[Expression] =>
        require(children.size == 2, "graft_vec_dot takes two arguments")
        DotProductExpression(children.head, children(1))
      }))

  /** Register into an already-running session (tests, notebooks). */
  def registerAll(spark: SparkSession): Unit =
    all.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** Session-extension entry point: enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")`.
  *
  * Injects [[GraftFunctionRegistry.all]] and the two optimizer rules
  * Catalyst genuinely lacks: [[graft.plans.PruneStaticExplodeFilter]]
  * (filter pushdown through explode-of-literal-tagged-structs, the
  * statement unpivot's shape) and [[graft.plans.RewriteRangeJoin]]
  * (naive SQL range joins become the bin-decomposed equi-join — the
  * opt-in `spark.graft.rangeJoin.binWidth` conf arms it). Custom
  * LogicalPlans/Strategies remain deliberately absent: every graft
  * operator is expressible as a declarative DataFrame plan, which
  * keeps Catalyst free to optimize — see SURVEY.md §4.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctionRegistry.all.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.PruneStaticExplodeFilter)
    ext.injectOptimizerRule(_ => graft.plans.RewriteRangeJoin)
  }
}
