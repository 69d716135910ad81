package graft

import org.apache.spark.sql.functions._

import graft.operators.Triangles

/** Diagnostic main: the triangle census' third decade, past the
  * sf0.1→sf1 lineitem pair (5.8→47.8s on 10× edges). Synthetic
  * Erdős–Rényi-ish graphs at two sizes a decade apart, built from
  * hash-mixed edge endpoints over √m-scaled node sets — the shape
  * where degree orientation matters least (uniform degrees), so the
  * measured ratio is the honest scan/shuffle scaling, not an
  * orientation win. Also prints a HUB variant (one node on 1% of all
  * edges) at the small size: the shape the √m out-degree cap exists
  * for — without orientation its wedge set would be ~(m/100)²/2.
  *
  * Usage: sbt "runMain graft.TrianglesScaleProbe [edgesSmall]"
  */
object TrianglesScaleProbe {
  def main(args: Array[String]): Unit = {
    val mSmall = args.headOption.map(_.toInt).getOrElse(500000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.median3

    def uniform(m: Int): org.apache.spark.sql.DataFrame = {
      val n = math.max(math.sqrt(m.toDouble).toLong * 20L, 100L)
      spark.range(m.toLong).select(
        concat(lit("n"), pmod(hash(col("id") * 2654435761L), lit(n)))
          .as("src"),
        concat(lit("n"), pmod(hash(col("id") * 40503L + 7L), lit(n)))
          .as("dst"))
    }
    def run(df: org.apache.spark.sql.DataFrame): (Double, Long) =
      median3(Triangles.perNode(df).queryExecution.toRdd.count())

    val (sSec, sRows) = run(uniform(mSmall))
    val (lSec, lRows) = run(uniform(mSmall * 10))
    // hub variant: 1% of edges touch one node
    val hub = uniform(mSmall).withColumn("src",
      when(pmod(hash(col("dst")), lit(100)) === 0, lit("HUB"))
        .otherwise(col("src")))
    val (hSec, hRows) = run(hub)
    println(s"""{"probe":"triangles_scale","m_small":$mSmall,""" +
      s""""uniform_small":{"sec":$sSec,"nodes_on_triangles":$sRows},""" +
      s""""uniform_10x":{"sec":$lSec,"nodes_on_triangles":$lRows},""" +
      s""""ratio":${lSec / sSec},""" +
      s""""hub_small":{"sec":$hSec,"nodes_on_triangles":$hRows}}""")
    spark.stop()
  }
}
