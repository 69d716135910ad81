package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-CORE membership by synchronous peeling — the third face of the
  * graph-cohesion trio (f26 triangles: per-node closure; f28 truss:
  * per-edge triangle support; THIS: the maximal subgraph where every
  * member keeps ≥ k live neighbors — Seidman 1983's degeneracy
  * core, the standard "dense enough to matter" screen investigators
  * run before the expensive per-node metrics).
  *
  * Each synchronous round recomputes degrees over the SURVIVING edge
  * set and drops every node below k; peeling cascades (removing a
  * hub's pendant can sink the hub next round) until a fixed point. A
  * FIXED round count keeps it engine-portable — the DuckDB twin runs
  * the identical rounds as chained CTEs, so membership and in-core
  * degrees hash-gate; the f29 spec asserts the rounds CONVERGED on
  * the gated data (round R ≡ an unbounded driver-side peel).
  *
  * Scale shape: per round ONE node-grain degree aggregate (map-side
  * combined) and TWO semi-joins of the edge set against the node-
  * grain survivor table — the f25/f28 round shape; nothing broadcast,
  * rounds lineage-broken with eager localCheckpoints and superseded
  * snapshots released (the Components discipline).
  */
object KCore {

  /** Nodes of the k-core after `rounds` synchronous peels, with their
    * in-core degree. `edges`: undirected rows (`src`, `dst`),
    * deduplicated/canonicalized internally, self-loops dropped.
    */
  def membership(
      edges: DataFrame, k: Long, rounds: Int,
      src: String = "src", dst: String = "dst"): DataFrame = {
    require(rounds >= 1, s"kcore: rounds must be >= 1, got $rounds")
    val sc = edges.sparkSession.sparkContext
    import Components.{checkpointDiff, release}
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    var (e, eBlocks) = checkpointDiff(sc) {
      edges
        .select(least(col(src), col(dst)).as("a"),
          greatest(col(src), col(dst)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true, ser)
    }
    // explode instead of unionAll: one scan of the serialized edge
    // checkpoint per degree pass instead of two (r15 — the Triangles
    // census rationale; this runs EVERY peel round)
    def degrees(ed: DataFrame): DataFrame =
      ed.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("d"))
    var i = 0
    var nEdges = e.count() // cached blocks — an O(partitions) read
    while (i < rounds) {
      // lazy checkpoint + the surviving-edge count as its materializing
      // action: one driver action per peel round instead of two (the
      // Components.minLabel rationale — the RDD-level persist caches
      // full rows whatever the count's plan prunes)
      val (next, nBlocks) = checkpointDiff(sc) {
        val keep = degrees(e).filter(col("d") >= k).select(col("node"))
        e.join(keep.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
          .join(keep.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
          .select(col("a"), col("b"))
          .localCheckpoint(false, ser)
      }
      val nNext = next.count()
      release(sc, eBlocks)
      e = next
      eBlocks = nBlocks
      i += 1
      // EARLY FIXPOINT EXIT — semantics-preserving, not a shortcut:
      // peeling only ever removes edges, so an unchanged edge count
      // means no node fell below k and every further round is the
      // identity; the remaining rounds the oracle still runs are
      // no-ops on its side too, so the gate is untouched. This is
      // what makes the fixed-round contract affordable at scale — the
      // cascade depth, not the round budget, prices the query.
      if (nNext == nEdges) i = rounds
      nEdges = nNext
    }
    val (out, _) = checkpointDiff(sc) {
      degrees(e).select(col("node"), col("d")).localCheckpoint()
    }
    release(sc, eBlocks)
    out
  }

  /** EXACT incremental k-core for an APPEND-ONLY edge batch — the tick
    * twin of [[membership]], the census `perEdgeDeltaDiff` discipline
    * at node grain. Returns `(newCore, checkpointBlocks)`; the caller
    * OWNS the result's checkpoint blocks (the per-face generation rule:
    * a store tick must never release an interactive query's frame).
    *
    * Why a delta is exact here: edge INSERTION is monotone for a fixed
    * k — the k-core only grows, so every old member stays a member —
    * and every connected component of (newCore \ oldCore), induced,
    * must contain an endpoint of a genuinely-new edge (otherwise that
    * component plus the old core had min-degree ≥ k in the OLD graph,
    * contradicting the old core's maximality). So the only nodes whose
    * membership can change are non-members reachable from Δ endpoints
    * through non-members of union-degree ≥ k — a Δ-seeded region, not
    * the corpus. The delta:
    *
    *   1. folds E ∪ Δ with an age tag in ONE aggregate (replayed
    *      batches become the identity — the set-algebra immunity);
    *   2. BFS over ELIGIBLE non-members (union degree ≥ k; nodes below
    *      k can never join) from the Δ endpoints — per round one
    *      broadcast-probed adjacency scan and one eligible-set scan,
    *      the corpus side never shuffles; the region is capped at
    *      `maxRegion` and a blowout FALLS BACK to the full peel
    *      (honest: a region that large means the answer itself changed
    *      at corpus scale, the d15 auto-route discipline);
    *   3. peels ONLY the candidate region to a fixed point — member
    *      support (`degO`) is static through the peel because members
    *      never leave, so each cascade round joins region-bounded
    *      frames only;
    *   4. patches in-core degrees: joiners get degO + in-region degree;
    *      old members get +1 per J-incident edge and per Δ
    *      member–member edge (exactly the edges absent from the old
    *      in-core count), merged with the broadcast anti/semi split so
    *      the stored node-grain table never shuffles.
    *
    * Equals `membership(old ∪ new, k, rounds)` whenever that peel
    * converges (it early-exits at the fixed point; the f29 spec gates
    * convergence) — property-gated over randomized append chains.
    *
    * `oldCore`: (node, d) rows — the previous CONVERGED membership
    * with in-core degrees, exactly [[membership]]'s output.
    */
  def membershipDeltaDiff(
      oldEdges: DataFrame, oldCore: DataFrame, newEdges: DataFrame,
      k: Long, fallbackRounds: Int = 64, maxRegion: Long = 2000000L,
      src: String = "src", dst: String = "dst"): (DataFrame, Set[Int]) = {
    require(k >= 1, s"kcore delta: k must be >= 1, got $k")
    val spark = oldEdges.sparkSession
    val sc = spark.sparkContext
    import Components.{checkpointDiff, release}
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    def canon(df: DataFrame, s: String, d: String) = df
      .select(least(col(s), col(d)).as("a"),
        greatest(col(s), col(d)).as("b"))
      .filter(col("a") =!= col("b"))
    // E ∪ Δ with the age tag in one aggregate (the perEdgeDeltaDiff
    // fold): an edge is new iff NO old row produced it, so replayed
    // batches are structurally absorbed. Consumed by the degree
    // aggregate, every BFS scan and the region edge extraction.
    val (all, allBlocks) = checkpointDiff(sc) {
      canon(oldEdges, src, dst).withColumn("is_new", lit(false))
        .unionAll(canon(newEdges, src, dst).withColumn("is_new", lit(true)))
        .groupBy("a", "b").agg(bool_and(col("is_new")).as("is_new"))
        .localCheckpoint(true, ser)
    }
    def fullPeel(): (DataFrame, Set[Int]) = {
      val (out, outBlocks) = checkpointDiff(sc) {
        membership(all.select(col("a"), col("b")), k, fallbackRounds,
          "a", "b")
      }
      release(sc, allBlocks)
      (out, outBlocks)
    }
    val delta = all.filter(col("is_new")).select(col("a"), col("b"))
    val deltaNodes = delta.select(col("a").as("node"))
      .unionAll(delta.select(col("b").as("node"))).distinct()
    if (deltaNodes.isEmpty) { // pure replay: edge set unchanged
      val (out, outBlocks) = checkpointDiff(sc) {
        oldCore.select(col("node"), col("d")).localCheckpoint()
      }
      release(sc, allBlocks)
      return (out, outBlocks)
    }
    // eligible non-members: union degree ≥ k (one corpus degree
    // aggregate + one node-grain anti against the old membership) —
    // nodes below k can never join, members never need to
    val (cand0, cand0Blocks) = checkpointDiff(sc) {
      all.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("du"))
        .filter(col("du") >= k).select(col("node"))
        .join(oldCore.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint(true, ser)
    }
    val adj = all.select(col("a").as("x"), col("b").as("y"))
      .unionAll(all.select(col("b").as("x"), col("a").as("y")))
    // Δ-seeded BFS through the eligible set
    var (visited, vBlocks) = checkpointDiff(sc) {
      cand0.join(broadcast(deltaNodes), Seq("node"), "left_semi")
        .localCheckpoint(true, ser)
    }
    var frontier = visited
    var fBlocks = Set.empty[Int]
    var nVisited = visited.count()
    var frontierEmpty = nVisited == 0
    while (!frontierEmpty) {
      // boundary-sized distinct (the round's one exchange); counted
      // BEFORE broadcasting so a hub frontier can never broadcast a
      // corpus-sized set — it falls back instead
      val (nbrs, nbrBlocks) = checkpointDiff(sc) {
        adj.join(broadcast(frontier.select(col("node").as("x"))),
            Seq("x"), "left_semi")
          .select(col("y").as("node")).distinct()
          .localCheckpoint(true, ser)
      }
      val nNbrs = nbrs.count()
      if (nVisited + nNbrs > maxRegion) {
        release(sc, vBlocks); release(sc, fBlocks)
        release(sc, nbrBlocks); release(sc, cand0Blocks)
        return fullPeel()
      }
      val (next, nextBlocks) = checkpointDiff(sc) {
        cand0.join(broadcast(nbrs), Seq("node"), "left_semi")
          .join(broadcast(visited), Seq("node"), "left_anti")
          .localCheckpoint(true, ser)
      }
      release(sc, nbrBlocks)
      val nNext = next.count()
      if (nNext == 0) {
        release(sc, nextBlocks)
        frontierEmpty = true
      } else {
        val (nv, nvBlocks) = checkpointDiff(sc) {
          visited.unionAll(next).localCheckpoint(true, ser)
        }
        release(sc, vBlocks); release(sc, fBlocks)
        visited = nv; vBlocks = nvBlocks
        frontier = next; fBlocks = nextBlocks
        nVisited += nNext
      }
    }
    release(sc, fBlocks)
    release(sc, cand0Blocks)
    if (nVisited == 0) { // no eligible node near Δ: membership is
      // unchanged; only member–member Δ edges can bump in-core degrees
      val (out, outBlocks) = checkpointDiff(sc) {
        val deltaMM = delta
          .join(oldCore.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(oldCore.select(col("node").as("b")), Seq("b"), "left_semi")
          .select(explode(array(col("a"), col("b"))).as("node"))
          .groupBy("node").agg(count(lit(1)).as("inc"))
        val untouched = oldCore.select(col("node"), col("d"))
          .join(broadcast(deltaMM.select(col("node"))),
            Seq("node"), "left_anti")
        untouched.unionAll(
          oldCore.select(col("node"), col("d"))
            .join(broadcast(deltaMM), Seq("node"))
            .select(col("node"), (col("d") + col("inc")).as("d")))
          .localCheckpoint()
      }
      release(sc, vBlocks); release(sc, allBlocks)
      return (out, outBlocks)
    }
    // region edges, classified once: x ∈ C always; y tagged member /
    // candidate. degO (member-side support) is static through the peel.
    val (bEdgesM, bmBlocks) = checkpointDiff(sc) {
      adj.join(broadcast(visited.select(col("node").as("x"))),
          Seq("x"), "left_semi")
        .join(oldCore.select(col("node").as("y")), Seq("y"), "left_semi")
        .select(col("x"), col("y"))
        .localCheckpoint(true, ser)
    }
    val (degO, degOBlocks) = checkpointDiff(sc) {
      bEdgesM.groupBy(col("x").as("node"))
        .agg(count(lit(1)).as("dgo")).localCheckpoint(true, ser)
    }
    val (eCC, eCCBlocks) = checkpointDiff(sc) {
      all.select(col("a"), col("b"))
        .join(broadcast(visited.select(col("node").as("a"))),
          Seq("a"), "left_semi")
        .join(broadcast(visited.select(col("node").as("b"))),
          Seq("b"), "left_semi")
        .localCheckpoint(true, ser)
    }
    // cascade peel of the region only — members never leave, so each
    // round is region-bounded: in-region degree + static degO vs k
    def degCC(av: DataFrame): DataFrame = eCC
      .join(broadcast(av.select(col("node").as("a"))), Seq("a"), "left_semi")
      .join(broadcast(av.select(col("node").as("b"))), Seq("b"), "left_semi")
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("dcc"))
    var alive = visited
    var aBlocks = vBlocks
    var nAlive = nVisited
    var done = false
    while (!done && nAlive > 0) {
      val (keep, keepBlocks) = checkpointDiff(sc) {
        alive.join(degCC(alive), Seq("node"), "left_outer")
          .join(degO, Seq("node"), "left_outer")
          .filter(coalesce(col("dcc"), lit(0L)) +
            coalesce(col("dgo"), lit(0L)) >= k)
          .select(col("node")).localCheckpoint(true, ser)
      }
      val nKeep = keep.count()
      done = nKeep == nAlive
      if (done) release(sc, keepBlocks)
      else {
        release(sc, aBlocks)
        alive = keep; aBlocks = keepBlocks; nAlive = nKeep
      }
    }
    // joiners with their in-core degrees; old members patched by the
    // broadcast anti/semi split (the support-merge discipline — the
    // stored node-grain side never shuffles)
    val (out, outBlocks) = checkpointDiff(sc) {
      val jRows = alive.join(degCC(alive), Seq("node"), "left_outer")
        .join(degO, Seq("node"), "left_outer")
        .select(col("node"), (coalesce(col("dcc"), lit(0L)) +
          coalesce(col("dgo"), lit(0L))).as("d"))
      val incFromJ = bEdgesM
        .join(broadcast(alive.select(col("node").as("x"))),
          Seq("x"), "left_semi")
        .select(col("y").as("node"))
      val deltaMM = delta
        .join(oldCore.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(oldCore.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(explode(array(col("a"), col("b"))).as("node"))
      val incs = incFromJ.unionAll(deltaMM)
        .groupBy("node").agg(count(lit(1)).as("inc"))
      val untouched = oldCore.select(col("node"), col("d"))
        .join(broadcast(incs.select(col("node"))), Seq("node"), "left_anti")
      untouched
        .unionAll(oldCore.select(col("node"), col("d"))
          .join(broadcast(incs), Seq("node"))
          .select(col("node"), (col("d") + col("inc")).as("d")))
        .unionAll(jRows)
        .localCheckpoint()
    }
    release(sc, aBlocks)
    if (aBlocks != vBlocks) release(sc, vBlocks)
    release(sc, bmBlocks); release(sc, degOBlocks); release(sc, eCCBlocks)
    release(sc, allBlocks)
    (out, outBlocks)
  }

  // one result generation per face (the Triangles slot discipline): a
  // convenience caller's previous frame is released on the NEXT call,
  // never someone else's — owners needing block custody use
  // membershipDeltaDiff directly (GraphStore.refresh does)
  private val lastResultBlocks =
    scala.collection.mutable.Map.empty[String, Set[Int]]

  /** Caller-friendly face of [[membershipDeltaDiff]]. */
  def membershipDelta(
      oldEdges: DataFrame, oldCore: DataFrame, newEdges: DataFrame,
      k: Long, fallbackRounds: Int = 64, maxRegion: Long = 2000000L,
      src: String = "src", dst: String = "dst"): DataFrame =
    synchronized {
      val (out, outBlocks) = membershipDeltaDiff(
        oldEdges, oldCore, newEdges, k, fallbackRounds, maxRegion, src, dst)
      Components.release(out.sparkSession.sparkContext,
        lastResultBlocks.getOrElse("membershipDelta", Set.empty))
      lastResultBlocks("membershipDelta") = outBlocks
      out
    }
}
