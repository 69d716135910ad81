package graft

import org.apache.spark.sql.functions._

/** Diagnostic main: measures [[graft.operators.Traverse.khop]]'s
  * frontier-bounded claim on the generated judgement graphs at 1× and
  * 10× (`tools/gen_sf1.py` scales by ADDING components at constant
  * density, so a FIXED seed set's k-hop neighborhood is the same size
  * at both scales). The probe separates the two cost classes the
  * operator has:
  *
  *   - the one-time symmetrize+checkpoint of the edge list — the only
  *     graph-bounded stage, expected ~linear in edges (measured as the
  *     khop of maxHops = 0, which builds the edge checkpoint and never
  *     expands);
  *   - the BFS rounds — frontier-bounded, expected ~FLAT across the
  *     decade for a fixed seed set (total minus the maxHops = 0 cost).
  *
  * Reachable-set equality across scales is asserted (the added
  * components must not touch the seeds' neighborhood), so a "flat"
  * timing can't hide a shrunken traversal. Prints one JSON line.
  *
  * Usage: sbt "runMain graft.KhopProbe [dir]"
  */
object KhopProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata-sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.operators.Traverse

    // seeds: 20 vertices of the BASE graph (present at both scales)
    val seeds = spark.read.parquet(s"$dir/judgements_base.parquet")
      .select(col("src").as("id")).distinct()
      .orderBy(col("id")).limit(20)
      .localCheckpoint()

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    var reachPerTag = Map.empty[String, Long]
    val out = for (tag <- Seq("judgements_base", "judgements")) yield {
      val edges = spark.read.parquet(s"$dir/$tag.parquet")
      val nEdges = edges.count()
      // warm both shapes once (parquet footers, codegen)
      Traverse.khop(edges, seeds, 3).queryExecution.toRdd.count()
      val (tBase, _) = timed(
        Traverse.khop(edges, seeds, 0).queryExecution.toRdd.count())
      val samples = (1 to 3).map { _ =>
        timed(Traverse.khop(edges, seeds, 3).queryExecution.toRdd.count())
      }
      val reach = samples.head._2
      require(samples.forall(_._2 == reach), s"$tag: reach varied")
      reachPerTag += tag -> reach
      val tFull = samples.map(_._1).sorted.apply(1) // median of 3
      s""""$tag":{"edges":$nEdges,"reach":$reach,""" +
        s""""edge_stage_sec":$tBase,"full_sec":$tFull,""" +
        s""""bfs_rounds_sec":${tFull - tBase}}"""
    }
    // the load-bearing assertion: scaling ADDED components, so the
    // fixed seeds' neighborhood must be IDENTICAL at both scales — a
    // flat timing over a shrunken traversal would be a false positive
    require(reachPerTag.values.toSet.size == 1,
      s"reach differs across scales: $reachPerTag — the generator's " +
        "constant-density contract broke and the timing ratio is void")
    println(out.mkString("{", ",", "}"))
    spark.stop()
  }
}
