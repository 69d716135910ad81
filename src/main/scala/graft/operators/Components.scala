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
    */
  def minLabel(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    val und = edges0.select(col("src"), col("dst"))
    val edges = und
      .union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.groupBy(col("src")).agg(
        least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbr = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
        .select(col("src").as("id"), col("nlabel"))
      val updated = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label")))
            .as("label"),
          (col("nlabel") < col("label")).as("__chg"))
        .localCheckpoint()
      changed = updated.filter(col("__chg")).count()
      labels = updated.drop("__chg")
      iter += 1
    }
    labels
  }
}
