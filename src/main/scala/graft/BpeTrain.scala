package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Trains the BPE merges fixture (`graft/bpe_merges.txt`) from a
  * documents corpus — the standard BPE training loop ([[Bpe.train]]:
  * count-then-lexicographic tie-break, deterministic for a given
  * corpus), emitting merges in training order = encode rank.
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

    val merges = Bpe.train(wordFreq.toSeq, numMerges)
    val w = new java.io.PrintWriter(
      new java.io.File(out), "UTF-8")
    try merges.foreach { case (a, b) => w.println(s"$a\t$b") }
    finally w.close()
    println(s"""{"merges":${merges.length},"words":${wordFreq.length},"out":"$out"}""")
    spark.stop()
  }
}
