package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = GraftSession.local(cpus)
    // Steady-state measurement: one untimed warmup pass absorbs JIT,
    // codegen compilation and parquet footer reads, so per-query numbers
    // reflect execution cost instead of first-touch session warmup.
    // Force FULL evaluation: df.count() lets Catalyst prune every
    // column, so projection-only queries (fingerprints, scores,
    // signatures) would measure an empty scan. toRdd materializes the
    // physical plan's actual output rows.
    def exec(name: String): Unit =
      try { SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => () }
    // optional filter for local iteration: SPARK_GRAFT_ONLY=q1_agg,d2_...
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    names.foreach(exec) // untimed warmup pass
    def timed(name: String): Double = {
      val t0 = System.nanoTime()
      exec(name)
      (System.nanoTime() - t0) / 1e9
    }
    // min of two timed runs: steady-state cost without scheduler noise
    val results = names.map(n => n -> math.min(timed(n), timed(n)))
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout goes through sbt's [info] prefixing — also drop the bare
    // JSON where tooling can read it unmangled
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("BENCH_LAST.json"), json + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
