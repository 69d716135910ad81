package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe
import graft.operators.TextAnalysis

/** BPE at REALISTIC vocabulary scale — the r11 verdict's "proven at
  * toy vocabulary" gap, measured:
  *
  *   1. the sf1 corpus trains to SATURATION (its synthetic vocabulary
  *      is closed — ~10 vocab-variant groups × 31 stems — so the
  *      merges table tops out far below a real tokenizer's 32k; the
  *      probe reports where);
  *   2. a 32k-merge table trains on a deterministic SYNTHETIC rich
  *      vocabulary ([[synthWordFreq]]: Zipf-weighted random-letter
  *      words — the word-table shape of a web corpus) and the
  *      incremental trainer ([[Bpe.train]], r12) is timed doing it —
  *      the naive full-recount reference is O(merges × corpus) and
  *      would take hours here;
  *   3. the t3b encode kernel ([[TextAnalysis.bpeTokenCount]]) runs on
  *      the sf0.1 AND sf1 corpora under the 80-merge fixture AND the
  *      32k table, median-of-3 — the per-distinct-word memo claim is
  *      that encode cost tracks the corpus's distinct words, NOT the
  *      merge count, so the two vocabularies should bench ~equal.
  *      Counts under the two tables differ by design (different
  *      vocabularies tokenize differently); losslessness of the 32k
  *      encode is require()-gated on a corpus sample.
  *
  *   sbt "runMain graft.BpeScaleProbe [sf01Dir] [sf1Dir]"
  */
object BpeScaleProbe {

  /** Deterministic Zipf-weighted random-letter word table — rich open
    * vocabulary (shared with the large-vocab specs so probe and spec
    * measure the same distribution).
    */
  private[graft] def synthWordFreq(
      nWords: Int, seed: Int = 7): Seq[(String, Long)] = {
    val rnd = new scala.util.Random(seed)
    (0 until nWords).map { rank =>
      val len = 3 + rnd.nextInt(10)
      val w = " " + (0 until len)
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      (w, math.max(1L, (1000000.0 / (rank + 1)).toLong))
    }.distinct
  }

  def main(args: Array[String]): Unit = {
    val sf01 = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sf1 = args.drop(1).headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    // 1. sf1-corpus training: closed vocabulary → saturation point
    val sf1Freq = Tables.load(spark, sf1, "documents")
      .select(col("text")).as[String]
      .flatMap(t => Bpe.preTokens(t))
      .groupBy(col("value").as("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val (satSec, sf1Merges) = Probes.timed(
      Bpe.train(sf1Freq, numMerges = 100000).length.toLong)

    // 2. 32k merges on the rich synthetic vocabulary
    val rich = synthWordFreq(60000)
    val t0 = System.nanoTime()
    val big = Bpe.train(rich, numMerges = 32768)
    val trainSec = (System.nanoTime() - t0) / 1e9
    require(big.length == 32768,
      s"rich vocabulary saturated early: ${big.length}")
    // losslessness of the 32k encode on a corpus sample
    val vocab = new Bpe.Vocab(big)
    Tables.load(spark, sf01, "documents")
      .select(col("text")).as[String].take(200).foreach { t =>
        val enc = Bpe.preTokens(t).flatMap(vocab.encode).mkString
        require(enc == Bpe.preTokens(t).mkString,
          s"32k encode lost characters on: ${t.take(60)}")
      }

    // 3. encode cost: fixture (80) vs 32k table, both corpora
    def bench(dir: String, merges: IndexedSeq[(String, String)]): Double =
      Probes.median3(TextAnalysis.bpeTokenCount(
        Tables.load(spark, dir, "documents"), merges)
        .queryExecution.toRdd.count())._1
    val rows = for {
      (sfName, dir) <- Seq(("sf0.1", sf01), ("sf1", sf1))
      (vName, m) <- Seq(("fixture80", Bpe.defaultMerges), ("synth32k",
        big.toIndexedSeq))
    } yield s"""{"sf":"$sfName","vocab":"$vName",""" +
      s""""merges":${m.length},""" +
      s""""sec":${"%.2f".format(bench(dir, m))}}"""
    println(
      s"""{"sf1_saturation_merges":$sf1Merges,""" +
        s""""sf1_train_sec":${"%.2f".format(satSec)},""" +
        s""""synth32k_train_sec":${"%.2f".format(trainSec)},""" +
        s""""encode":${rows.mkString("[", ",", "]")}}""")
    spark.stop()
  }
}
