package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measures WHEN the persisted PQ codebook must retrain: recall@5 of
  * PQ search (s5 shape) over a progressively DRIFTED corpus, using
  * (a) the STALE codebook trained on the pre-drift corpus — the
  * store's persisted `_pq` — versus (b) a codebook retrained on the
  * drifted corpus, both against the exact brute-force top-5 of the
  * drifted corpus. The gap between the curves is the retrain trigger
  * a production deployment alarms on.
  *
  *   sbt "runMain graft.PqDriftProbe [sfDir]"
  *
  * Two deterministic drift models (re-runs produce identical curves):
  *
  *  - `noise`: v' = v + α·w, w per-(vec, dim) pseudo-noise in
  *    [-0.5, 0.5) (md5-derived, the d7/s2 derivation) — isotropic
  *    jitter at increasing magnitude. MEASURED NOT to separate the
  *    curves: jitter barely changes the per-subspace distributions, so
  *    the stale codebook quantizes the jittered corpus about as well
  *    as a retrain — magnitude drift alone is NOT a retrain trigger.
  *  - `rotation`: dims d and d+32 rotate by angle θ (a Givens mix
  *    across subspaces) — the distribution SHAPE moves while every
  *    pairwise cosine is exactly preserved (rotation invariance), so
  *    the brute-force ground truth is identical at every θ and any
  *    recall change is purely codebook mismatch. ALSO measured ~flat
  *    on this corpus: near-isotropic subspace distributions are
  *    rotation-invariant in shape, so the stale codebook stays
  *    near-optimal.
  *  - `newmass`: a fraction p of the corpus is REPLACED by tight
  *    clusters around 5 fresh directions the old corpus never
  *    occupied — a new data source arriving (the SemDeDup world).
  *    In-cluster ranking needs codewords where the new mass sits;
  *    the stale codebook has none. This is the drift class that
  *    forces the retrain, and the curve separation quantifies it.
  */
object PqDriftProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))

    def noise(id: Column, i: Column): Column =
      (conv(substring(md5(concat_ws(":", lit("drift"), id, i)), 1, 15),
        16, 10).cast("double") / lit((1L << 60).toDouble)) - lit(0.5)
    def jittered(alpha: Double): DataFrame =
      emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x + lit(alpha) * noise(col("vec_id"), i)).cast("float"))
          .as("embedding"))
        .localCheckpoint()
    def rotated(theta: Double): DataFrame = {
      val c = math.cos(theta)
      val s = math.sin(theta)
      def at(j: Column): Column = element_at(col("embedding"), j + 1)
      emb.select(col("vec_id"),
        transform(col("embedding"), (x, i) =>
          when(i < 32, lit(c) * x - lit(s) * at(i + 32))
            .otherwise(lit(s) * at(i - 32) + lit(c) * x)
            .cast("float")).as("embedding"))
        .localCheckpoint()
    }

    def newmass(p: Double): DataFrame = {
      // new-cluster member: mu(id % 5) + 0.6·w — tight enough that
      // in-cluster neighbors dominate each replaced query's top-5,
      // spread enough that ranking inside the cluster is non-trivial
      def mu(id: Column, i: Column): Column =
        (conv(substring(md5(concat_ws(":", lit("mu"), pmod(id, lit(5)), i)),
          1, 15), 16, 10).cast("double") / lit((1L << 60).toDouble)) -
          lit(0.5)
      emb.select(col("vec_id"),
        when(pmod(col("vec_id"), lit(100)) < lit((100 * p).toInt),
          transform(col("embedding"), (_, i) =>
            (mu(col("vec_id"), i) +
              lit(0.6) * noise(col("vec_id"), i)).cast("float")))
          .otherwise(col("embedding")).as("embedding"))
        .localCheckpoint()
    }

    // the stale codebook: trained ONCE on the pre-drift corpus (what
    // the VecStore `_pq` table holds)
    val stale = Similarity.trainPqCodebook(emb).localCheckpoint()

    def top5(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    def recall(got: Map[Long, Set[Long]],
        truth: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
      per.sum / per.size
    }

    def point(kind: String, level: Double, c: DataFrame,
        shortlist: Int = 50): String = {
      val q = c.filter(col("vec_id") < 50)
      val truth = top5(Similarity.bruteTopK(c, q, k = 5))
      val staleR = recall(
        top5(Similarity.pqTopK(c, q, k = 5, shortlist = shortlist,
          codebook = Some(stale))), truth)
      val freshR = recall(
        top5(Similarity.pqTopK(c, q, k = 5, shortlist = shortlist)),
        truth)
      // the monitorable trigger: quantization residual under the stale
      // vs a retrained codebook (no ground truth needed in production)
      def qerr(cb: DataFrame): Double =
        Similarity.pqQuantizationError(c, cb).head().getDouble(0)
      val staleE = qerr(stale)
      val freshE = qerr(Similarity.trainPqCodebook(c))
      s"""{"kind":"$kind","level":$level,"shortlist":$shortlist,""" +
        s""""stale_recall5":$staleR,"fresh_recall5":$freshR,""" +
        s""""stale_qerr":${"%.6f".format(staleE)},""" +
        s""""fresh_qerr":${"%.6f".format(freshE)}}"""
    }
    val pi = math.Pi
    val rows = (
      Seq(0.0, 0.1, 0.2, 0.4).map(a => point("noise", a, jittered(a))) ++
      Seq(pi / 8, pi / 2).map(t => point("rotation", t, rotated(t))) ++
      Seq(0.1, 0.25, 0.5).map(p => point("newmass", p, newmass(p))) ++
      // the shortlist-starved regime: ADC ranking is load-bearing when
      // the exact re-rank has no slack to absorb codebook mismatch
      Seq(0.25, 0.5).map(p =>
        point("newmass_sl5", p, newmass(p), shortlist = 5))
    ).mkString("[", ",", "]")
    println(s"""{"curve":$rows,"sf":"$sfDir"}""")
    spark.stop()
  }
}
