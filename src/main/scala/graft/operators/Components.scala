package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by bounded iterative
  * min-label propagation — the shared engine behind judgement-driven
  * entity canonicalization ([[Xref.resolverMapping]]) and near-dup
  * document clustering ([[Dedup.nearDupClusters]]).
  *
  * Each vertex starts at min(self, neighbors); each round takes
  * label(v) ← min(label(v), min over neighbors' labels) until no label
  * changes (or `maxIter`, a runaway bound). One equi-join plus one
  * map-side-combined aggregation per round — no collects, no
  * per-vertex driver work — converging in O(component diameter)
  * rounds; blocking/LSH candidate graphs are near-cliques, so the
  * diameter is small at any data scale. The edge set is
  * localCheckpoint-ed once up front so an expensive upstream (the
  * blocking pipeline) is computed exactly once, and each round's
  * labels are checkpointed to keep the loop's lineage flat.
  */
object Components {

  /** `edges`: directed (src, dst) rows, any element type with a total
    * order (string ids, long ids); symmetrized and deduplicated
    * internally. Returns (id, label) for every vertex that appears in
    * an edge, `label` = the component's minimum vertex id.
    *
    * Throws if `maxIter` rounds pass without convergence: an
    * unconverged label map is WRONG (vertices of one component carry
    * different labels), and every caller — judgement canonicalization,
    * near-dup clustering — would silently split clusters. A graph that
    * legitimately needs more rounds (diameter > maxIter) should raise
    * the bound explicitly rather than get a wrong answer quietly.
    */
  def minLabel(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = edges0.sparkSession.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    // Track the block-manager ids each round's localCheckpoint pins so
    // superseded rounds can be dropped — otherwise every iteration's
    // label snapshot stays cached for the app's lifetime.
    def checkpointDiff[A](before: Set[Int])(body: => A): (A, Set[Int]) = {
      val r = body
      (r, persistedIds -- before)
    }
    val und = edges0.select(col("src"), col("dst"))
    val (edges, edgeBlocks) = checkpointDiff(persistedIds) {
      und
        .union(und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
    }
    var (labels, labelBlocks) = checkpointDiff(persistedIds) {
      edges.groupBy(col("src")).agg(
          least(col("src"), min(col("dst"))).as("label"))
        .select(col("src").as("id"), col("label"))
        .localCheckpoint()
    }
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
        .select(col("src").as("id"), col("nlabel"))
      val (updated, newBlocks) = checkpointDiff(persistedIds) {
        labels.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label")))
              .as("label"),
            (col("nlabel") < col("label")).as("__chg"))
          .localCheckpoint()
      }
      changed = updated.filter(col("__chg")).count()
      // previous round's checkpoint is superseded — release its blocks
      labelBlocks.foreach(id =>
        sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      labelBlocks = newBlocks
      labels = updated.drop("__chg")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"Components.minLabel did not converge in $maxIter rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "maxIter — raise it (labels would be silently wrong)")
    // the final labels checkpoint is eager, so it no longer reads edges
    edgeBlocks.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
    labels
  }
}
