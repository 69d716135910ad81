package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-file-per-bucket layout shuffle for bucketed table writes —
  * the r12 file-count finding: Spark's `bucketBy` writer emits one
  * file per (task × partition × bucket), so writing from an N-split
  * source multiplies the store's file count by N. The repo's probe
  * stores only ever looked right because their sources were single
  * parquet files (one task); the moment the sf1/sf10 embeddings were
  * sharded for scan parallelism, a 1,600-file store became a
  * 330,000-file store and every pruned read drowned in file opens
  * (VecServeProbe inverted from 2.9× store-advantage to 5× store-
  * DISADVANTAGE on identical data). At 100 TB every real source is
  * many-split, so the pre-write shuffle below is load-bearing, not
  * cosmetic.
  *
  * The shuffle keys on (partition columns, bucket id), where the
  * bucket id `pmod(hash(bucketCols), n)` is bitwise Spark's own
  * bucket-id expression (`HashPartitioning.partitionIdExpression` —
  * Murmur3, seed 42, same modulo): every row of one output file
  * co-locates in exactly one task, so each write emits exactly ONE
  * file per non-empty (partition, bucket) — `lists × buckets` for
  * the vector store — regardless of the incoming split count. Cost:
  * one Exchange of the rows being written (batch-sized on appends,
  * corpus-sized on compacts — the same order as the write itself).
  */
object BucketedLayout {
  def apply(
      df: DataFrame,
      buckets: Int,
      bucketCols: Seq[String],
      partCols: Seq[String] = Nil): DataFrame =
    df.repartition(
      (partCols.map(col) :+
        pmod(hash(bucketCols.map(col): _*), lit(buckets))): _*)
}
