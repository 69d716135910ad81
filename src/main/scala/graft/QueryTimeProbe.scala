package graft

/** Diagnostic main: median-of-3 wall time for a named subset of
  * registry queries against one sf directory — the per-operator decade
  * instrument (Bench times the whole suite; this times the queries a
  * BASELINE row is being written about, with the same toRdd
  * materialization discipline).
  *
  * Usage: sbt "runMain graft.QueryTimeProbe <sfDir> <query> [query…]"
  */
object QueryTimeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: QueryTimeProbe <sfDir> <query> [query…]")
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val out = names.map { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      fn(spark, sfDir).queryExecution.toRdd.count() // warmup
      val (t, n) = Probes.median3(
        fn(spark, sfDir).queryExecution.toRdd.count())
      s""""$name":{"sec":$t,"rows":$n}"""
    }
    println(s"""{"probe":"query_time","sf_dir":"$sfDir",""" +
      s""""queries":{${out.mkString(",")}}}""")
    spark.stop()
  }
}
