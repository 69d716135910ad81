package graft

import org.apache.spark.sql.functions._

import graft.operators.{KCore, LabelProp, Triangles}

/** Diagnostic main: synthetic scale decades for the r14 graph
  * operators — f28's truss+label-propagation pipeline and f29's
  * k-core peel — on the same Erdős–Rényi-ish generator as
  * [[TrianglesScaleProbe]] (constant density, n ∝ m, average degree
  * ≈ 70: the 100 TB corpus-growth shape — more entities, same
  * connectivity). What each should track:
  *
  *   - f29 k-core: every peel round is degree-aggregate + two
  *     semi-joins, all edge-grain — linear in m per round; the EARLY
  *     FIXPOINT EXIT makes the round count the cascade depth, which
  *     constant-density growth does not deepen. Expect ~linear.
  *   - f28 communities: the wedge census dominates (the f26 bound);
  *     the truss filter then shrinks the LP rounds to the surviving
  *     edge set. Expect the census' constant-density ~linear decade.
  *
  * Usage: sbt "runMain graft.GraphScaleProbe [edgesSmall]"
  */
object GraphScaleProbe {
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

    def kcore(df: org.apache.spark.sql.DataFrame): (Double, Long) =
      median3(KCore.membership(df, k = 3L, rounds = 10)
        .queryExecution.toRdd.count())
    def communities(df: org.apache.spark.sql.DataFrame): (Double, Long) =
      median3 {
        val kept = Triangles.perEdge(df)
          .filter(col("support") >= 2)
          .select(col("a").as("src"), col("b").as("dst"))
        LabelProp.minLabelRounds(kept, rounds = 10)
          .queryExecution.toRdd.count()
      }

    val n = (m: Int) => m / 35L
    val (ks, ksRows) = kcore(graph(mSmall, n(mSmall)))
    val (kl, klRows) = kcore(graph(mSmall * 10, n(mSmall * 10)))
    val (cs, csRows) = communities(graph(mSmall, n(mSmall)))
    val (cl, clRows) = communities(graph(mSmall * 10, n(mSmall * 10)))
    println(s"""{"probe":"graph_scale","m_small":$mSmall,""" +
      s""""kcore":{"small_sec":$ks,"large_sec":$kl,""" +
      s""""ratio":${kl / ks},"rows":[$ksRows,$klRows]},""" +
      s""""communities":{"small_sec":$cs,"large_sec":$cl,""" +
      s""""ratio":${cl / cs},"rows":[$csRows,$clRows]}}""")
    spark.stop()
  }
}
