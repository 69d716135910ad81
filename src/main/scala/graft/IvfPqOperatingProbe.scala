package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measures s6's OPERATING CURVE: recall@5 and latency across the
  * (lists × nProbe) grid, so the 100 TB operating point is a measured
  * trade instead of an assumed one (the recall floor spec holds one
  * setting; this probe maps the surface around it).
  *
  *   sbt "runMain graft.IvfPqOperatingProbe [sfDir]"
  *
  * List count varies by coarsening the label key (label % L — merged
  * cluster means, the way a deployment would re-bucket its quantizer);
  * recall is against the exact brute-force top-5 of the same corpus;
  * latency is the min of 2 timed runs after a collect that doubles as
  * warmup. Deterministic end to end.
  */
object IvfPqOperatingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val emb = Tables.load(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 50)
    val truth = Similarity.bruteTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

    def timed(f: => Long): Double = Probes.timed(f)._1
    val rows = for {
      lists <- Seq(10, 25, 100)
      nProbe <- Seq(1, 2, 5, 10)
    } yield {
      val cents = Similarity.centroids(emb, pmod(col("label"), lit(lists)))
      // shortlist pinned at the historical fixed-50 so grid rows stay
      // comparable with pre-r11 BENCH_HISTORY rows (the r11 default is
      // AUTO = scaledShortlist, measured by the shortlist_axis below)
      def q = Similarity.ivfPqTopK(emb, queries, cents, k = 5,
        nProbe = nProbe, shortlist = 50)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qq, rs) => qq -> rs.map(_._2).toSet }
      val per = truth.map { case (qq, t) =>
        got.getOrElse(qq, Set.empty).intersect(t).size.toDouble / t.size }
      val recall = per.sum / per.size
      val sec = Seq(
        timed(q.queryExecution.toRdd.count()),
        timed(q.queryExecution.toRdd.count())).min
      s"""{"lists":$lists,"nProbe":$nProbe,""" +
        s""""recall5":${"%.3f".format(recall)},""" +
        s""""sec":${"%.2f".format(sec)}}"""
    }
    // r11: the SHORTLIST axis — the r10 grid proved recall is pinned
    // by the ADC shortlist, not nProbe; this sweep measures the
    // recovery curve that the scaled-shortlist default encodes
    // (Similarity.scaledShortlist), at a mid-grid operating point
    val nCorpus = emb.count()
    val shortlistRows = for (sl <- Seq(50, 100, 200, 400)) yield {
      val lists = 25; val nProbe = 2
      val cents = Similarity.centroids(emb, pmod(col("label"), lit(lists)))
      def q = Similarity.ivfPqTopK(emb, queries, cents, k = 5,
        nProbe = nProbe, shortlist = sl)
      val got = q.collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (qq, rs) => qq -> rs.map(_._2).toSet }
      val per = truth.map { case (qq, t) =>
        got.getOrElse(qq, Set.empty).intersect(t).size.toDouble / t.size }
      val recall = per.sum / per.size
      val sec = Seq(
        timed(q.queryExecution.toRdd.count()),
        timed(q.queryExecution.toRdd.count())).min
      s"""{"shortlist":$sl,"lists":$lists,"nProbe":$nProbe,""" +
        s""""probed":${nCorpus * nProbe / lists},""" +
        s""""recall5":${"%.3f".format(recall)},""" +
        s""""sec":${"%.2f".format(sec)}}"""
    }
    println(s"""{"grid":${rows.mkString("[", ",", "]")},""" +
      s""""shortlist_axis":${shortlistRows.mkString("[", ",", "]")},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
