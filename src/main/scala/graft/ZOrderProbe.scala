package graft

import org.apache.spark.sql.functions._

import graft.sources.ZOrderLayout

/** Diagnostic main: measures what the z-order layout buys a selective
  * scan, on the metadata the pruning actually reads (row-group footer
  * stats) AND on wall-clock.
  *
  * Three layouts of the same N-row uniform 2-D table, 64 files each:
  * unsorted (ingest order), linear sort on x (the ClickHouse ORDER BY
  * analogue), and z-order(x, y). Probed with the three predicate
  * shapes that matter: leading-column range (linear's home game),
  * OTHER-column range (linear reads 100%), and the 2-D box (the
  * multi-tenant "this customer, this week" shape). Row-group hit
  * counts are exact footer arithmetic ([[ZOrderLayout
  * .matchingRowGroups]]); scan timings are median-of-3 `count()` over
  * the pushed predicate.
  *
  * Usage: sbt "runMain graft.ZOrderProbe [rows]"
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4000000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.median3

    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder_probe").toString
    // deterministic uniform 2-D corpus: hash-mix the row index
    val data = spark.range(n.toLong).select(
      pmod(hash(col("id") * 2654435761L), lit(65536)).cast("long").as("x"),
      pmod(hash(col("id") * 40503L + 17L), lit(65536)).cast("long").as("y"))
    data.repartition(64).write.mode("overwrite").parquet(s"$base/unsorted")
    data.repartitionByRange(64, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrderLayout.write(data, s"$base/zorder", Seq("x", "y"), numFiles = 64,
      knownBounds = Some((Seq(0L, 0L), Seq(65535L, 65535L))))

    val xOnly = Map("x" -> ((0L, 4095L)))
    val yOnly = Map("y" -> ((0L, 4095L)))
    val box = Map("x" -> ((0L, 4095L)), "y" -> ((0L, 4095L)))
    val layouts = Seq("unsorted", "linear", "zorder")

    def scanSec(dir: String, pred: Map[String, (Long, Long)]): Double =
      median3 {
        val f = pred.map { case (c, (lo, hi)) =>
          col(c).between(lo, hi) }.reduce(_ && _)
        spark.read.parquet(s"$base/$dir").filter(f).count()
      }._1

    val parts = for {
      (pname, pred) <- Seq(("x", xOnly), ("y", yOnly), ("box", box))
      l <- layouts
    } yield {
      val (hit, total) = ZOrderLayout.matchingRowGroups(s"$base/$l", pred)
      val sec = scanSec(l, pred)
      f""""${l}_$pname":{"rg":"$hit/$total","sec":$sec%.3f}"""
    }
    println(s"""{"metric":"zorder_probe","rows":$n,${parts.mkString(",")}}""")
    spark.stop()
  }
}
