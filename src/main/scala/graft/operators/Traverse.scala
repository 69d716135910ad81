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
  *   - each round eager-checkpoints exactly ONE frame — the new
  *     visited set (the [[Components]] discipline; the frontier is the
  *     previous round's hops slice of those cached blocks) — so
  *     lineage stays flat and superseded snapshots release their
  *     blocks immediately.
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
    val sc = edges0.sparkSession.sparkContext
    val (edges, edgeBlocks) = symmetrized(edges0)
    val out = khopOn(edges, seeds, maxHops)
    Components.release(sc, edgeBlocks)
    out
  }

  /** Symmetrize + dedup + eager-checkpoint an edge list once; the
    * caller releases the returned blocks when every traversal over it
    * is done (shortestPathMembers runs TWO expansions on one copy).
    */
  private def symmetrized(edges0: DataFrame): (DataFrame, Set[Int]) = {
    val und = edges0.select(col("src"), col("dst"))
    Components.checkpointDiff(edges0.sparkSession.sparkContext) {
      und
        .union(und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
    }
  }

  /** The BFS loop over an ALREADY symmetrized+checkpointed edge set.
    * `seeds` carries `id` plus any CARRY columns (f23's side tag);
    * the visited set keys on (id ++ carry), so independently-tagged
    * walks advance in the same jobs. ONE materialization per round —
    * the new visited checkpoint; the frontier is the previous round's
    * hops slice of the cached blocks, and the growth check is a
    * filter-isEmpty over the new blocks.
    */
  private def khopOn(
      edges: DataFrame, seeds: DataFrame, maxHops: Int,
      carry: Seq[String] = Nil): DataFrame = {
    require(maxHops >= 0, s"Traverse.khop: maxHops must be >= 0, got $maxHops")
    val sc = edges.sparkSession.sparkContext
    val keyCols = ("id" +: carry).map(col)
    var (visited, visitedBlocks) = Components.checkpointDiff(sc) {
      seeds.select(keyCols: _*).distinct()
        .withColumn("hops", lit(0).cast("int"))
        .localCheckpoint()
    }
    var h = 1
    var emptied = maxHops == 0
    while (!emptied && h <= maxHops) {
      val frontier = visited.filter(col("hops") === h - 1)
      // ONE driver action per round (r16): the checkpoint is LAZY and
      // the frontier-growth count is its materializing action — the
      // RDD-level persist caches the full visited snapshot regardless
      // of the count's plan (the Components.minLabel rationale), so
      // the old eager-checkpoint job + isEmpty job collapse into one.
      // The early-exit CONTRACT is unchanged: the count is exactly the
      // new-hop row count the isEmpty tested.
      val (nv, nvBlocks) = Components.checkpointDiff(sc) {
        val next = frontier
          .select((col("id").as("src") +: carry.map(col)): _*)
          .join(edges, Seq("src"))
          .select((col("dst").as("id") +: carry.map(col)): _*).distinct()
          .join(visited, "id" +: carry, "left_anti")
          .withColumn("hops", lit(h).cast("int"))
        visited.union(next).localCheckpoint(false)
      }
      emptied = nv.filter(col("hops") === h).count() == 0
      Components.release(sc, visitedBlocks)
      visited = nv
      visitedBlocks = nvBlocks
      h += 1
    }
    visited
  }

  /** Shortest-path MEMBERSHIP between two seed sets — "how are A and
    * B connected": every vertex on ANY shortest A–B path, via the
    * classic meet-in-the-middle identity `distA(v) + distB(v) =
    * dist(A, B)`. Two bounded BFS expansions ([[khop]], each only
    * `maxHops` deep — half the path budget each, so the per-side
    * frontier stays small where a one-sided 2·maxHops walk explodes),
    * one equi-join on vertex, and the minimum rides a broadcast
    * 1-row aggregate — no driver-side collect. Empty when A and B
    * are further apart than 2·maxHops (or disconnected): the null
    * min joins nothing.
    *
    * Output: (id, hops_a, hops_b, dist) for members only. COVERAGE
    * CONTRACT: membership needs BOTH distances, so a vertex appears
    * only if it lies within maxHops of each side — the returned DAG
    * is COMPLETE when dist(A, B) ≤ maxHops, and for maxHops <
    * dist ≤ 2·maxHops it is the MIDDLE SLICE of the DAG (the
    * endpoints' halves sit beyond the opposite expansion's budget;
    * dist itself is still exact). Callers wanting the full DAG size
    * maxHops to the distance they are willing to render, not half.
    */
  def shortestPathMembers(
      edges0: DataFrame, seedsA: DataFrame, seedsB: DataFrame,
      maxHops: Int): DataFrame = {
    val sc = edges0.sparkSession.sparkContext
    // symmetrize ONCE, and run BOTH expansions in ONE tagged run of
    // the shared BFS loop — the frontier carries a side column and
    // the visited set keys on (id, side), so each round advances both
    // walks in the same jobs: maxHops rounds total instead of
    // 2·maxHops, half the checkpoint materializations of two
    // sequential khop calls (measured 5.9 → 3.9s on f23's sf0.1
    // grain; identical frontier-bounded shape)
    val (edges, edgeBlocks) = symmetrized(edges0)
    val tagged = seedsA.select(col("id"), lit(0).as("side"))
      .unionAll(seedsB.select(col("id"), lit(1).as("side")))
    val visited = khopOn(edges, tagged, maxHops, carry = Seq("side"))
    val da = visited.filter(col("side") === 0)
      .select(col("id"), col("hops").as("hops_a"))
    val db = visited.filter(col("side") === 1)
      .select(col("id"), col("hops").as("hops_b"))
    Components.release(sc, edgeBlocks)
    val joined = da.join(db, Seq("id"))
    val dmin = joined
      .agg(min(col("hops_a") + col("hops_b")).as("d"))
    joined
      .join(broadcast(dmin),
        col("hops_a") + col("hops_b") === col("d"))
      .select(col("id"), col("hops_a").cast("long").as("hops_a"),
        col("hops_b").cast("long").as("hops_b"),
        col("d").cast("long").as("dist"))
  }
}
