package graft

import org.apache.spark.sql.DataFrame

/** Diagnostic main: measures both connected-components engines
  * ([[graft.operators.Components.minLabel]] — O(diameter) rounds — and
  * [[graft.operators.Components.minLabelStars]] — O(log n) rounds) on
  * the generated judgement-graph tables at 1× and 10× scale
  * (`tools/gen_sf1.py`: near-cliques + diameter-30-60 chains, 10×
  * COMPONENTS at constant per-component density). Because scaling adds
  * components rather than growing them, round counts should be flat
  * and wall time ~linear in edges — the sf1 evidence for the
  * iterative operators whose cost is data-shape-driven. Prints one
  * JSON line; label equality between the engines is asserted at both
  * scales.
  *
  * Usage: sbt "runMain graft.ComponentsScaleProbe [dir]"
  */
object ComponentsScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.operators.Components

    def run(edges: DataFrame, engine: DataFrame => DataFrame)
        : (Double, Long, DataFrame) = {
      engine(edges).queryExecution.toRdd.count() // warm
      val out = engine(edges)
      val t0 = System.nanoTime()
      val n = out.queryExecution.toRdd.count()
      ((System.nanoTime() - t0) / 1e9, n, out)
    }
    val out = for (tag <- Seq("judgements_base", "judgements")) yield {
      val edges = spark.read.parquet(s"$dir/$tag.parquet")
      val nEdges = edges.count()
      // maxIter raised past the default 50: the chains run to diameter
      // 60, and at the default the engine REFUSES loudly (verified —
      // that refusal is the documented guard, and exactly why d6b
      // exists). The probe measures what the raised ceiling costs.
      val (tMin, nMin, lblMin) = run(edges, Components.minLabel(_, maxIter = 80))
      val (tStars, nStars, lblStars) = run(edges, Components.minLabelStars(_))
      // both engines must label the identical vertex set identically —
      // diffed over the TIMED invocations' outputs (each engine returns
      // an eagerly checkpointed frame, so the diff re-reads cached
      // blocks instead of re-running two multi-round iterative jobs)
      val diff = lblMin.exceptAll(lblStars).count()
      require(diff == 0 && nMin == nStars,
        s"$tag: engines disagree (exceptAll=$diff, $nMin vs $nStars)")
      s""""$tag":{"edges":$nEdges,"vertices":$nMin,""" +
        s""""min_label_sec":$tMin,"stars_sec":$tStars}"""
    }
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
