package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded multi-hop graph traversal — the neighborhood-expansion
  * query an investigative-graph user runs after `adjacent` (the
  * reference's one-hop `get_adjacent`, `store.py` via followthemoney
  * traversal): "everything within k hops of these entities, with the
  * hop distance". The FTM face is f22 (seed a nation, walk the
  * customer/supplier/order references); the same kernel serves any
  * (src, dst) edge list.
  *
  * Level-synchronous BFS, the only shape that scales on Spark:
  *
  *   - each round is ONE equi-join of the current frontier against the
  *     symmetrized edge list plus one anti-join against the visited
  *     set — both shuffles are FRONTIER-bounded, never graph-bounded
  *     (a 100 TB edge list with a 1k-entity seed moves kB per round);
  *   - rounds are bounded by `maxHops` (a user-facing contract, not a
  *     convergence hope), so the plan is k joins deep, not data-driven;
  *   - every round's frontier/visited snapshot is `localCheckpoint`ed
  *     (the [[Components]] discipline) so lineage stays flat and
  *     superseded snapshots release their blocks immediately.
  *
  * Distances are exact minimal hop counts: level-synchronous expansion
  * discovers every vertex first at its minimal depth, and the visited
  * anti-join keeps later (longer) rediscoveries out.
  */
object Traverse {

  /** `edges0`: directed (src, dst) rows, traversed UNDIRECTED (the
    * adjacency semantics of f13 — an edge connects regardless of
    * direction). `seeds`: one `id` column. Returns (id, hops) for
    * every vertex within `maxHops` of any seed; seeds themselves at
    * hops = 0 (seed ids absent from the edge list still appear).
    */
  def khop(edges0: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"Traverse.khop: maxHops must be >= 0, got $maxHops")
    val sc = edges0.sparkSession.sparkContext
    val und = edges0.select(col("src"), col("dst"))
    val (edges, edgeBlocks) = Components.checkpointDiff(sc) {
      und
        .union(und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
    }
    var (visited, visitedBlocks) = Components.checkpointDiff(sc) {
      seeds.select(col("id")).distinct()
        .withColumn("hops", lit(0).cast("int"))
        .localCheckpoint()
    }
    var frontier = visited
    var frontierBlocks = Set.empty[Int]
    var h = 1
    var emptied = maxHops == 0
    while (!emptied && h <= maxHops) {
      val (next, nextBlocks) = Components.checkpointDiff(sc) {
        frontier.select(col("id").as("src"))
          .join(edges, Seq("src"))
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .withColumn("hops", lit(h).cast("int"))
          .localCheckpoint()
      }
      emptied = next.isEmpty
      if (emptied) {
        Components.release(sc, nextBlocks)
      } else {
        val (nv, nvBlocks) = Components.checkpointDiff(sc) {
          visited.union(next).localCheckpoint()
        }
        // the new visited checkpoint is eager: the old visited and the
        // pre-previous frontier no longer back anything — release them
        Components.release(sc, visitedBlocks)
        Components.release(sc, frontierBlocks)
        visited = nv
        visitedBlocks = nvBlocks
        frontier = next
        frontierBlocks = nextBlocks
      }
      h += 1
    }
    Components.release(sc, frontierBlocks)
    Components.release(sc, edgeBlocks)
    visited
  }
}
