package graft

import org.apache.spark.sql.functions._

import graft.operators.Xref

/** Measures the incremental-resolver claim: folding ONE new positive
  * judgement into an existing canonical mapping
  * ([[Xref.applyJudgements]]) versus recomputing connected components
  * over the whole judgement graph (what f20 does per run) — at two
  * graph scales, so the scaling SLOPE of each path is visible, plus
  * the delta face's row count as the component-boundedness witness
  * (two 5-member clusters merge ⇒ exactly the 5 rows of the cluster
  * whose canonical changes, at ANY graph size).
  *
  *   sbt "runMain graft.ResolverIncrementalProbe [clusters] [clusters2]"
  *
  * The graph is the realistic resolver shape: M disjoint 5-member
  * star clusters (blocking/xref components are near-cliques of tiny
  * diameter), and the new judgement merges clusters 0 and 1. The probe
  * cross-checks the incremental mapping against the recompute exactly
  * (same rows) before trusting the timing.
  */
object ResolverIncrementalProbe {
  def main(args: Array[String]): Unit = {
    val m1 = args.headOption.map(_.toInt).getOrElse(5000)
    val m2 = args.drop(1).headOption.map(_.toInt).getOrElse(50000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.median3

    def run(clusters: Int): String = {
      val eid = (n: org.apache.spark.sql.Column) =>
        format_string("e%08d", n)
      val judgements = spark.range(clusters.toLong * 4)
        .select(
          eid(expr("(id DIV 4) * 5")).as("left_id"),
          eid(expr("(id DIV 4) * 5 + id % 4 + 1")).as("right_id"),
          lit("positive").as("judgement"),
          lit(1L).as("ts"))
        .localCheckpoint()
      val mapping = Xref.resolverMapping(judgements).localCheckpoint()
      val batch = spark.range(1).select(
        lit("e00000000").as("left_id"), lit("e00000005").as("right_id"),
        lit("positive").as("judgement"), lit(2L).as("ts"))
        .localCheckpoint()
      val all2 = judgements.unionByName(batch).localCheckpoint()

      val (fullSec, fullN) = median3 {
        Xref.resolverMapping(all2).count()
      }
      val (incSec, incN) = median3 {
        Xref.applyJudgements(mapping, batch, all2).count()
      }
      val delta = Xref.applyJudgementsDelta(mapping, batch).get
      val deltaRows = delta.count()
      // exactness before timing is believed: same (entity, canonical)
      // rows from both paths
      val inc = Xref.applyJudgements(mapping, batch, all2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val full = Xref.resolverMapping(all2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      require(inc == full && incN == fullN,
        s"incremental mapping diverged at $clusters clusters")
      s"""{"clusters":$clusters,"entities":${clusters * 5},""" +
        s""""full_recompute_sec":$fullSec,"incremental_sec":$incSec,""" +
        s""""delta_rows":$deltaRows}"""
    }

    val r1 = run(m1)
    val r2 = run(m2)
    println(s"""{"probe":"resolver_incremental","small":$r1,"large":$r2}""")
    spark.stop()
  }
}
