package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: measures the d15 source-overlap matrix's two
  * regimes at HIGH source cardinality — the r12 audit's one measured
  * scale-killer (sf10's 2000 sources: the exact grid is sources² =
  * 2M sketch-algebra pairs, 635s) against the r13 default, the banded
  * candidate pre-filter ([[PipelineQueries.sourceOverlap]] above its
  * `bandedAbove` threshold).
  *
  * The sf10 documents corpus is ALREADY source-clustered: the
  * generator (tools/gen_sf10.py) gives source s vocabulary variant
  * s mod 100, so the 2000 sources form 100 vocabulary-disjoint
  * clusters of 20 — the shape a real multi-crawl corpus has (sources
  * overlap within a crawl family, not across domains). The true
  * overlap grid is therefore ~100 · C(20,2) = 19k pairs (plus any
  * cross-cluster pairs the 0.16% exact-dup injection manages to push
  * into both sources' first-8 sketch minimums), so the banded path's
  * candidate count is overlap-driven ~19k, not 2M. The probe asserts
  * the cluster structure (every candidate pair shares the source's
  * vocab class) rather than trusting it.
  *
  * Timings separate the corpus scan (shared by both regimes: one
  * shingle explosion → per-source KMV sketches) from the pair stage,
  * because the scan is corpus-bounded and identical — the regime
  * choice only moves the pair stage. The exact grid is NOT re-timed
  * by default (635s is on record in BASELINE round-12); pass
  * `--exact` to re-measure it.
  *
  * Usage: sbt "runMain graft.OverlapScaleProbe [dir] [--exact]"
  */
object OverlapScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf10")
    val exact = args.contains("--exact")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.functions.Kmv
    import graft.operators.Dedup

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val k = 16384
    val bands = 8

    // stage 1 — the shared corpus scan: shingles → per-source sketches
    val sketch = () => docs
      .select(col("source"), explode(Dedup.shinglesN(col("text"), 3)).as("g"))
      .groupBy(col("source"))
      .agg(Kmv.kmvSketch(col("g"), k).as("sk"))
    val (tScan, nSources) = Probes.timed(sketch().count())
    val sk = sketch().localCheckpoint() // materialized once for the pair stages

    // stage 2a — the banded pair stage (the r13 default above 256 sources)
    val (tBand, nPairs) = Probes.median3(
      PipelineQueries.overlapFromSketches(sk, k, bands)
        .queryExecution.toRdd.count())

    // the full default face end-to-end (scan + regime probe + pairs),
    // exactly what a d15 caller pays at this cardinality
    val (tFace, nFace) = Probes.timed {
      val out = PipelineQueries.sourceOverlap(docs, k, bands)
      out.queryExecution.toRdd.count()
    }
    require(nFace == nPairs,
      s"default face must route to the banded regime: $nFace vs $nPairs")

    // cluster-structure accounting: within-class pairs share a whole
    // vocabulary (the recall target — moderate Jaccard ≈ 0.35 between
    // same-class random draws, so B = 8 detection is probabilistic:
    // the smallest SHARED hash must sit in both sides' first-B
    // minimums); cross-class pairs can only arise from the 0.16%
    // exact-dup injection copying a doc across source groups —
    // genuine shared content, counted separately to show candidates
    // are overlap-driven. Recall is measured at the default B and at
    // 2B (the knob a higher-recall audit turns).
    def recallAt(b: Int): (Long, Long) = {
      val cand = PipelineQueries.overlapFromSketches(sk, k, b)
        .select("source_a", "source_b").collect()
      def cls(s: String) = s.stripPrefix("src").toLong % 100
      val cross = cand.count(r => cls(r.getString(0)) != cls(r.getString(1)))
      (cand.length.toLong - cross, cross.toLong)
    }
    val withinExpected = 100L * (20L * 19L / 2L)
    val (within8, cross8) = recallAt(bands)
    val (within16, cross16) = recallAt(bands * 2)
    require(within8 >= withinExpected * 9 / 10,
      s"recall over within-class pairs: $within8 of $withinExpected")
    require(nPairs < nSources * (nSources - 1) / 2 / 10,
      s"banding failed to collapse the grid: $nPairs pairs")
    val crossCluster = cross8
    val recallJson =
      s""","within_recall_b8":${within8.toDouble / withinExpected},""" +
      s""""within_recall_b16":${within16.toDouble / withinExpected},""" +
      s""""cross_cluster_b16":$cross16"""

    val exactPart = if (exact) {
      val a = sk.select(col("source").as("source_a"), col("sk").as("ska"))
      val b = sk.select(col("source").as("source_b"), col("sk").as("skb"))
      val grid = a.join(b, col("source_a") < col("source_b"))
        .select(col("source_a"), col("source_b"),
          Kmv.intersectEstimate(col("ska"), col("skb"), k).as("shared"))
      val (tGrid, nGrid) = Probes.timed(grid.queryExecution.toRdd.count())
      s""","exact_grid_sec":$tGrid,"exact_pairs":$nGrid"""
    } else ""

    println(s"""{"probe":"overlap_scale","dir":"$dir",""" +
      s""""sources":$nSources,"scan_sec":$tScan,""" +
      s""""banded_pairs_sec":$tBand,"banded_pairs":$nPairs,""" +
      s""""face_total_sec":$tFace,"cross_cluster":$crossCluster""" +
      recallJson + exactPart + "}")
    spark.stop()
  }
}
