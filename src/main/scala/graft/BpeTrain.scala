package graft

import scala.collection.mutable

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Trains the BPE merges fixture (`graft/bpe_merges.txt`) from a
  * documents corpus — the standard BPE training loop (Sennrich et al.
  * 2016): start from characters, repeatedly merge the most frequent
  * adjacent symbol pair (ties broken lexicographically, so the table
  * is DETERMINISTIC for a given corpus), emit merges in training
  * order = encode rank.
  *
  *   sbt "runMain graft.BpeTrain [sfDir] [outFile] [numMerges]"
  *
  * Pre-tokenization is [[Bpe.PreToken]] — the SAME compiled pattern
  * the encoder uses, which is the reason this trainer is Scala rather
  * than a python tool: train/serve word boundaries cannot drift.
  * Word frequencies aggregate in Spark (corpus-sized); the merge loop
  * itself runs on the driver over the distinct-word table (vocabulary-
  * sized — the standard trainer shape; BPE training is a one-time
  * fixture build, not a query-path operation).
  */
object BpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.drop(1).headOption
      .getOrElse("src/main/resources/graft/bpe_merges.txt")
    val numMerges = args.drop(2).headOption.map(_.toInt).getOrElse(500)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    val wordFreq: Array[(String, Long)] = Tables
      .load(spark, sfDir, "documents")
      .select(col("text")).as[String]
      .flatMap(t => Bpe.preTokens(t))
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // driver merge loop over the vocabulary: words as symbol vectors
    val words: Array[(mutable.ArrayBuffer[String], Long)] =
      wordFreq.map { case (w, n) =>
        (mutable.ArrayBuffer.from(w.iterator.map(_.toString)), n)
      }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts.update(p, counts.getOrElse(p, 0L) + n)
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // deterministic: highest count, then lexicographically least
        val best = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms.update(i, joined)
              syms.remove(i + 1)
            } else i += 1
          }
        }
        step += 1
      }
    }
    val w = new java.io.PrintWriter(
      new java.io.File(out), "UTF-8")
    try merges.foreach { case (a, b) => w.println(s"$a\t$b") }
    finally w.close()
    println(s"""{"merges":${merges.length},"words":${words.length},"out":"$out"}""")
    spark.stop()
  }
}
