package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Diagnostic main: the triangle census' third decade, past the
  * sf0.1→sf1 lineitem pair (5.8→47.8s on 10× edges). Two synthetic
  * Erdős–Rényi-ish decades that isolate WHAT grows:
  *
  *   - CONSTANT density (n ∝ m, average degree fixed ≈ 70 — the
  *     100 TB corpus-growth shape: more entities, same connectivity):
  *     the wedge bound Σ d_out² grows linearly with m, so the census
  *     should track ~10× on 10× edges;
  *   - DENSIFYING (n ∝ √m — degree grows √10× per decade): the wedge
  *     bound itself grows ~30×, and the honest claim is that time
  *     tracks the WEDGE count (the O(m^{3/2}) structural bound), not
  *     the edge count — no algorithm beats its output-side bound.
  *
  * Also a HUB variant (one node on 1% of all edges) at the small
  * size: the shape the degree orientation exists for — without it
  * the hub's wedge set alone would be ~(m/100)²/2 ≈ 12.5M from one
  * node at m = 500k; with it the hub is everyone's sink and
  * contributes NO wedges.
  *
  * Usage: sbt "runMain graft.TrianglesScaleProbe [edgesSmall]"
  */
object TrianglesScaleProbe {
  def main(args: Array[String]): Unit = {
    val mSmall = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.median3

    def graph(m: Int, n: Long): org.apache.spark.sql.DataFrame =
      spark.range(m.toLong).select(
        concat(lit("n"), pmod(hash(col("id") * 2654435761L), lit(n)))
          .as("src"),
        concat(lit("n"), pmod(hash(col("id") * 40503L + 7L), lit(n)))
          .as("dst"))
    def run(df: org.apache.spark.sql.DataFrame): (Double, Long) =
      median3(Triangles.perNode(df).queryExecution.toRdd.count())

    // constant density: avg degree 2m/n ≈ 70 at both sizes
    val (cs, csRows) = run(graph(mSmall, mSmall / 35L))
    val (cl, clRows) = run(graph(mSmall * 10, mSmall * 10L / 35L))
    // densifying: n ∝ √m
    def sqN(m: Int): Long = math.max(math.sqrt(m.toDouble).toLong * 20L, 100L)
    val (ds, dsRows) = run(graph(mSmall, sqN(mSmall)))
    val (dl, dlRows) = run(graph(mSmall * 10, sqN(mSmall * 10)))
    // hub variant: 1% of edges touch one node
    val hub = graph(mSmall, sqN(mSmall)).withColumn("src",
      when(pmod(hash(col("dst")), lit(100)) === 0, lit("HUB"))
        .otherwise(col("src")))
    val (hs, hsRows) = run(hub)
    println(s"""{"probe":"triangles_scale","m_small":$mSmall,""" +
      s""""const_density":{"small_sec":$cs,"large_sec":$cl,""" +
      s""""ratio":${cl / cs},"rows":[$csRows,$clRows]},""" +
      s""""densifying":{"small_sec":$ds,"large_sec":$dl,""" +
      s""""ratio":${dl / ds},"rows":[$dsRows,$dlRows]},""" +
      s""""hub_small":{"sec":$hs,"rows":$hsRows}}""")
    spark.stop()
  }
}
