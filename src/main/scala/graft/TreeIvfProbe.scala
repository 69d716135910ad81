package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Flat vs TREE coarse assignment as the inverted-list count grows —
  * the measurement behind [[graft.operators.Similarity.treeQuantizer]]:
  * the flat argmax scores |rows|·L pairs, the tree √L-ish
  * (topCount + L/topCount per row), so the separation must WIDEN with
  * the decade (sf1: L = 100, 20k vectors; sf10: L = 1000, 200k
  * vectors — pair scores 200M flat vs ~12.6M tree). Reports, per
  * scale:
  *
  *   - flat/tree corpus-assignment wall (median-of-3, one warmup),
  *   - the agreement rate between the two assignments (the tree's
  *     only approximation — a vector whose nearest leaf lives under a
  *     different subtree),
  *   - tree training wall (one-off; centroid-grain),
  *   - end-to-end s7-form search wall vs the flat s3 form.
  *
  *   sbt "runMain graft.TreeIvfProbe [sfDir ...]"
  */
object TreeIvfProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/repo/testdata-sf1", "/root/repo/testdata-sf10")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.{median3, timed}
    val out = dirs.map { dir =>
      val emb = Tables.load(spark, dir, "embeddings")
      val corpus = emb.select(col("vec_id").as("id"), col("embedding"))
        .localCheckpoint()
      val cents = Similarity.centroids(emb, col("label")).localCheckpoint()
      val nLists = cents.count()
      val topCount = math.max(2, math.round(math.sqrt(nLists.toDouble)).toInt)
      val cn = Similarity.centNorms(cents)
      val (flatSec, nFlat) = median3 {
        Similarity.nearestLists(corpus, cn, "id", 1)
          .queryExecution.toRdd.count()
      }
      val (trainSec, _) = timed {
        val (tp, lm) = Similarity.treeQuantizer(cents, topCount)
        tp.count() + lm.count()
      }
      val (tops, leafMap) = Similarity.treeQuantizer(cents, topCount)
      val topCn = Similarity.centNorms(
        tops.select(col("top_id").as("list_id"), col("centroid")))
      val leaves = Similarity.treeLeaves(cents, leafMap)
      val (treeSec, nTree) = median3 {
        Similarity.treeDescend(corpus, "id", topCn, leaves)
          .queryExecution.toRdd.count()
      }
      require(nFlat == nTree, s"assignment row drift: $nFlat vs $nTree")
      val flat = Similarity.nearestLists(corpus, cn, "id", 1)
        .select(col("id"), col("list_id").as("flat_list"))
      val agree = Similarity.treeDescend(corpus, "id", topCn, leaves)
        .select(col("id"), col("list_id"))
        .join(flat, Seq("id"))
        .agg(avg(when(col("list_id") === col("flat_list"), 1.0)
          .otherwise(0.0)).as("a"))
        .collect()(0).getDouble(0)
      val queries = emb.filter(col("vec_id") < 50)
        .select(col("vec_id"), col("embedding")).localCheckpoint()
      val (s3Sec, _) = median3 {
        Similarity.ivfTopK(corpus.select(col("id").as("vec_id"),
          col("embedding")), queries, cents, k = 5, nProbe = 3)
          .queryExecution.toRdd.count()
      }
      val (s7Sec, _) = median3 {
        Similarity.ivfTreeTopK(corpus.select(col("id").as("vec_id"),
          col("embedding")), queries, cents, k = 5,
          topCount = topCount, nProbeTop = 2, nProbe = 3)
          .queryExecution.toRdd.count()
      }
      f"""{"dir":"$dir","lists":$nLists,"rows":$nFlat,"top_count":$topCount,
         |"assign_flat_sec":$flatSec%.2f,"assign_tree_sec":$treeSec%.2f,
         |"tree_train_sec":$trainSec%.2f,"assign_agreement":$agree%.4f,
         |"search_flat_sec":$s3Sec%.2f,"search_tree_sec":$s7Sec%.2f}"""
        .stripMargin.replace("\n", "")
    }
    println(out.mkString("[", ",", "]"))
    spark.stop()
  }
}
