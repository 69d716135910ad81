package graft

import org.apache.spark.sql.SaveMode

/** Bloom-filter skip-index probe (r14, BASELINE evidence): writes one
  * parquet table per option set and reports footer-measured bloom
  * skip counts via [[graft.sources.BloomSkip]] — the evidence behind
  * the stores' id-column bloom defaults.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8)
    import spark.implicits._
    val df = (1 to 200000).map(i => (s"e${i % 20000}", i.toLong))
      .toDF("canonical_id", "v")
    def write(path: String, opts: Map[String, String]): Unit =
      df.repartition(2).write.mode(SaveMode.Overwrite)
        .option("parquet.block.size", (256 * 1024).toString)
        .options(opts)
        .parquet(path)
    write("/tmp/bloom_probe/off", Map.empty)
    write("/tmp/bloom_probe/adaptive", Map(
      "parquet.bloom.filter.enabled#canonical_id" -> "true",
      "parquet.bloom.filter.adaptive.enabled" -> "true"))
    write("/tmp/bloom_probe/ndv", Map(
      "parquet.bloom.filter.enabled#canonical_id" -> "true",
      "parquet.bloom.filter.expected.ndv#canonical_id" -> "20000"))
    write("/tmp/bloom_probe/plain", Map(
      "parquet.bloom.filter.enabled#canonical_id" -> "true"))
    Seq("off", "adaptive", "ndv", "plain").foreach { v =>
      val absent = graft.sources.BloomSkip.skippableRowGroups(
        s"/tmp/bloom_probe/$v", "canonical_id", "no-such-id")
      val present = graft.sources.BloomSkip.skippableRowGroups(
        s"/tmp/bloom_probe/$v", "canonical_id", "e123")
      println(s"BLOOMPROBE $v absent=$absent present=$present")
    }
    spark.stop()
  }
}
