package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Measures d8's split cost: the fused registry query recomputes the
  * whole d6 cluster map so the DuckDB oracle can gate end-to-end, but
  * the path a real pipeline runs is keepBest over a PRECOMPUTED
  * cluster table (d6's output is persisted — it feeds d8, the corpus
  * report, and every retention audit). This probe times the fused
  * form vs the tail alone (cluster map materialized once, as a stored
  * table would be) and asserts the outputs identical.
  *
  *   sbt "runMain graft.KeepBestTailProbe [sfDir]"
  */
object KeepBestTailProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val d = Tables.load(spark, sfDir, "documents")
    import Probes.median3
    val (fusedSec, fusedN) = median3 {
      Dedup.keepBest(d,
        Dedup.nearDupClusters(d, numHashes = 12, rowsPerBand = 2))
        .queryExecution.toRdd.count()
    }
    // the stored-cluster-map path: d6's output materialized once
    val clusters = Dedup
      .nearDupClusters(d, numHashes = 12, rowsPerBand = 2)
      .localCheckpoint()
    val (tailSec, tailN) = median3 {
      Dedup.keepBest(d, clusters).queryExecution.toRdd.count()
    }
    val fused = Dedup.keepBest(d,
      Dedup.nearDupClusters(d, numHashes = 12, rowsPerBand = 2))
      .collect().map(_.toString).sorted
    val tail = Dedup.keepBest(d, clusters)
      .collect().map(_.toString).sorted
    require(fused.sameElements(tail), "fused/tail output drift")
    println(
      s"""{"fused_sec":$fusedSec,"tail_sec":$tailSec,""" +
        s""""rows":$fusedN,"sf":"$sfDir","equal_check":"ok"}""")
    spark.stop()
  }
}
