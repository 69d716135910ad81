package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact triangle census over an undirected entity graph.
  *
  * Triangle support ("how many closed triples does this entity sit
  * in") is the standard cohesion / community-strength feature the
  * pointwise traversal faces (f22 k-hop, f23 shortest path) and the
  * global rank face (f25 PageRank) cannot state. The reference's
  * entity graph surface (ftm_columnstore/query.py adjacency via
  * `prop_type = 'entity'`) is a star/bipartite shape that is
  * triangle-free by construction, so the query-layer face (f26) runs
  * the census on the lineitem CO-OCCURRENCE graph, where a closed
  * order–part–supplier triple is the semantic unit.
  *
  * Algorithm: degree orientation (Chiba–Nishizeki / "forward"
  * counting). Every undirected edge is directed from its lower
  * (degree, id) endpoint to its higher one; the orientation is acyclic
  * and bounds every out-degree by O(√m), so the wedge join fans out to
  * at most O(m^{3/2}) candidate wedges — the known optimal bound for
  * exact triangle listing — instead of Σ deg² for the naive
  * neighbor-pair expansion (a single hub node would make that
  * quadratic). Each triangle is counted EXACTLY once: under an acyclic
  * orientation a triangle has exactly one node with out-degree 2
  * inside it.
  *
  * Scale shape: every step is an equi-join or hash aggregate on graph
  * keys — distinct-edge exchange, node-grain degree aggregate, two
  * degree attachments, the wedge self-join on the spoke node, and the
  * closing edge lookup. Degree tables are node-grain and edge tables
  * edge-grain, so nothing is broadcast (at 100 TB both scale with the
  * data); skew is bounded structurally by the √m out-degree cap —
  * the one join key that could be hot (a hub's out-list) is exactly
  * the key the orientation refuses to give a long list to.
  */
object Triangles {

  // the PREVIOUS result blocks, keyed PER FACE ("perNode" /
  // "perEdge"): a new census on one face releases only that face's
  // previous generation, so an interactive perNode frame survives a
  // concurrent perEdge (e.g. a stream-thread GraphStore.refresh) and
  // perNode + perEdge composed in one job each keep one live
  // generation. A bench loop that calls f26 many times still holds
  // ONE generation per face, not the session's whole history.
  // Single-generation contract — per face: consume (collect/write)
  // each census before requesting the next one ON THE SAME FACE, or
  // use [[perEdgeDiff]]/[[perNodeDiff]] and own the release yourself.
  private val lastResultBlocks =
    scala.collection.mutable.Map.empty[String, Set[Int]]

  /** Per-node triangle counts. `edges` carries one row per (possibly
    * duplicated, possibly reversed) undirected edge in columns
    * (`src`, `dst`); self-loops are dropped, duplicates collapsed.
    * Returns (node, n_triangles) for every node on ≥ 1 triangle.
    *
    * Block-manager discipline (the r13 sf1 in-suite finding — the
    * census's checkpointed edge frames were the biggest resident
    * state in the whole suite, 219s in-suite vs 24s isolated once the
    * block manager started spilling them): the census now runs EAGER
    * (the PageRank/Components form). The two edge-grain intermediates
    * are checkpointed SERIALIZED (MEMORY_AND_DISK_SER — the frames
    * are consumed exactly twice each, so the per-read deserialization
    * is paid twice against a 3-5× smaller resident footprint), the
    * node-grain result is eagerly checkpointed, and the edge frames
    * are RELEASED before returning — the caller's frame owns only
    * node-grain blocks, and nothing edge-grain outlives the call.
    */
  def perNode(edges: DataFrame, src: String = "src",
      dst: String = "dst"): DataFrame =
    slotted("perNode")(perNodeDiff(edges, src, dst))

  /** [[perNode]] returning its checkpoint block ids — the caller OWNS
    * the release (`Components.release` once the frame is consumed);
    * nothing is registered in the per-face generation map, so this
    * face never stomps (and is never stomped by) another live census.
    */
  def perNodeDiff(edges: DataFrame, src: String = "src",
      dst: String = "dst"): (DataFrame, Set[Int]) =
    census(edges, src, dst) { tri =>
      tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    }

  /** Per-EDGE triangle support: how many triangles contain each
    * undirected edge — the k-truss building block (an edge of
    * support ≥ k−2 survives in the k-truss). Returns canonical
    * (a, b, support) rows with a < b, only for edges on ≥ 1 triangle.
    * Same census, different corner aggregation: each triangle
    * (x, y, z) credits its three edges once.
    */
  def perEdge(edges: DataFrame, src: String = "src",
      dst: String = "dst"): DataFrame =
    slotted("perEdge")(perEdgeDiff(edges, src, dst))

  /** [[perEdge]] returning its checkpoint block ids — caller-owned
    * release, bypasses the per-face generation map (see
    * [[perNodeDiff]]). [[graft.sources.GraphStore.refresh]] uses this
    * so a refresh tick never releases an interactive f26/f28 frame.
    */
  def perEdgeDiff(edges: DataFrame, src: String = "src",
      dst: String = "dst"): (DataFrame, Set[Int]) =
    census(edges, src, dst) { tri =>
      // (y, z) is canonical already (y < z by construction); the two
      // spoke edges (x, y), (x, z) canonicalize per pair — the spoke
      // x is the DEGREE-ORDER minimum of its triangle, not the id
      // minimum
      tri.select(explode(array(
          array(col("x"), col("y")),
          array(col("x"), col("z")),
          array(col("y"), col("z")))).as("e"))
        .select(
          least(element_at(col("e"), 1), element_at(col("e"), 2)).as("a"),
          greatest(element_at(col("e"), 1), element_at(col("e"), 2)).as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("support"))
    }

  // release the slot's previous generation, run the census, record
  // the new generation under the slot
  private def slotted(slot: String)(run: => (DataFrame, Set[Int]))
      : DataFrame = synchronized {
    val (out, outBlocks) = run
    Components.release(out.sparkSession.sparkContext,
      lastResultBlocks.getOrElse(slot, Set.empty))
    lastResultBlocks(slot) = outBlocks
    out
  }

  private def census(edges: DataFrame, src: String, dst: String)(
      finish: DataFrame => DataFrame): (DataFrame, Set[Int]) =
      synchronized {
    val sc = edges.sparkSession.sparkContext
    import Components.{checkpointDiff, release}
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    // canonical undirected edge set: a < b, no loops, no dups.
    // e and oriented are each consumed by TWO downstream branches
    // (orientation + closing lookup; both wedge sides) — materialized
    // once so the lineage branches read blocks instead of re-running
    // the distinct/joins.
    val (e, eBlocks) = checkpointDiff(sc) {
      edges
        .select(least(col(src), col(dst)).as("a"),
          greatest(col(src), col(dst)).as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
        .localCheckpoint(true, ser)
    }
    // explode instead of unionAll: one scan of the serialized e
    // checkpoint instead of two (each union branch re-reads and
    // re-deserializes every block; the generator pays neither)
    val deg = e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient a→b when (d(a), a) < (d(b), b); a < b already, so the
    // tie case keeps the canonical direction
    val (oriented, oBlocks) = checkpointDiff(sc) {
      e
        .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
        .select(
          when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
          when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
        .localCheckpoint(true, ser)
    }
    // wedges: unordered out-neighbor pairs at each spoke u
    val wedges = oriented.as("w1")
      .join(oriented.as("w2"),
        col("w1.u") === col("w2.u") && col("w1.v") < col("w2.v"))
      .select(col("w1.u").as("x"), col("w1.v").as("y"), col("w2.v").as("z"))
    // close the wedge: y < z by construction, so the closing edge is
    // the canonical (a=y, b=z) row if it exists
    val tri = wedges.join(e,
      wedges("y") === e("a") && wedges("z") === e("b"))
      .select(col("x"), col("y"), col("z"))
    val (out, outBlocks) = checkpointDiff(sc) {
      finish(tri).localCheckpoint()
    }
    release(sc, eBlocks)
    release(sc, oBlocks)
    (out, outBlocks)
  }

  /** INCREMENTAL per-edge census (r15): update a stored support table
    * for an edge-batch APPEND without re-running the corpus-grain
    * wedge join — the classic delta-census: every triangle gained by
    * `E ∪ Δ` contains ≥ 1 Δ edge, so enumerating common neighbors of
    * each Δ edge's endpoints over the UNION adjacency finds them all,
    * and attributing each new triangle to its MAXIMUM new edge (by
    * canonical (a, b) order — old edges never compete) counts each
    * exactly once however many of its edges are new (1, 2 or 3).
    *
    * Exactness: `perEdgeDelta(E, perEdge(E), Δ)` ≡ `perEdge(E ∪ Δ)` —
    * property-gated over randomized append chains (the f20b
    * incremental≡batch discipline). Appends only: a takedown (pop)
    * removes triangles, which this face does not model — callers fall
    * back to the full census when tombstones are pending
    * ([[graft.sources.GraphStore.refresh]] does exactly that).
    *
    * Scale shape — the point of the face: the wedge expansion is
    * Σ_{(u,v) ∈ Δ} deg(min-degree endpoint), BATCH-bounded, not
    * corpus-bounded, and every Δ-derived side is BROADCAST (probes,
    * Δ-endpoint degree set, the support patch), so the corpus-grain
    * inputs pay exactly THREE narrow exchanges — the orientation-dedup
    * tag-aggregate, the closing-edge equi-join, and the stored-support
    * merge — plus broadcast-probed scans; there is no m^1.5 wedge
    * join, no oriented-edge checkpoint, no triangle explode-aggregate
    * at corpus grain. (The full census pays ~6 corpus exchanges AND
    * the wedge join.) Assumption made explicit: an append batch is
    * store-tick sized — Δ and its Σ-min-degree wedge fan-out fit a
    * broadcast; a corpus-sized "batch" belongs on the full census.
    *
    * @param oldEdges   the edge set BEFORE the batch (any orientation/
    *                   dups; canonicalized internally)
    * @param oldSupport `perEdge(oldEdges)`-shaped rows (a, b, support)
    *                   — extra columns ignored
    * @param newEdges   the appended batch (edges already in `oldEdges`
    *                   are ignored — replay-immune)
    * @return the UPDATED (a, b, support) table for `E ∪ Δ` (edges on
    *         ≥ 1 triangle, the [[perEdge]] contract), plus the
    *         checkpoint block ids the caller must release
    */
  def perEdgeDeltaDiff(
      oldEdges: DataFrame, oldSupport: DataFrame, newEdges: DataFrame,
      src: String = "src", dst: String = "dst"): (DataFrame, Set[Int]) =
      synchronized {
    val sc = oldEdges.sparkSession.sparkContext
    import Components.{checkpointDiff, release}
    val ser = StorageLevel.MEMORY_AND_DISK_SER
    def canon(df: DataFrame, s: String, d: String) = df
      .select(least(col(s), col(d)).as("a"),
        greatest(col(s), col(d)).as("b"))
      .filter(col("a") =!= col("b"))
    // E ∪ Δ with the age tag, in ONE aggregate: orientation-dedup and
    // the old/new split fold into a single groupBy — an edge is new
    // iff NO old row produced it (which also makes replayed batches
    // the identity). Consumed by the adjacency (twice), the Δ-degree
    // scan and the closing join: materialized once, serialized.
    val (all, allBlocks) = checkpointDiff(sc) {
      canon(oldEdges, src, dst).withColumn("is_new", lit(false))
        .unionAll(canon(newEdges, src, dst).withColumn("is_new", lit(true)))
        .groupBy("a", "b").agg(bool_and(col("is_new")).as("is_new"))
        .localCheckpoint(true, ser)
    }
    val delta = all.filter(col("is_new")).select(col("a"), col("b"))
    // probe from each Δ edge's LOWER-degree endpoint — the hub-safe
    // choice (Σ min-degree, the delta twin of the census orientation).
    // Degrees are computed for Δ ENDPOINTS ONLY: a broadcast semi over
    // one scan of `all`, never a corpus-grain node aggregate.
    val deltaNodes = delta.select(col("a").as("node"))
      .unionAll(delta.select(col("b").as("node"))).distinct()
    val degD = all.select(explode(array(col("a"), col("b"))).as("node"))
      .join(broadcast(deltaNodes), Seq("node"), "left_semi")
      .groupBy("node").agg(count(lit(1)).as("d"))
    val probes = delta
      .join(degD.select(col("node").as("a"), col("d").as("da")), "a")
      .join(degD.select(col("node").as("b"), col("d").as("db")), "b")
      .select(col("a"), col("b"),
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
    // adjacency over the UNION (triangles may close through other Δ
    // edges), each direction carrying its canonical edge + age; the
    // PROBES broadcast into the scan — the corpus side never shuffles
    val adj = all.select(col("a").as("x"), col("b").as("y"),
        col("a").as("ea"), col("b").as("eb"), col("is_new").as("en"))
      .unionAll(all.select(col("b").as("x"), col("a").as("y"),
        col("a").as("ea"), col("b").as("eb"), col("is_new").as("en")))
    val cand = adj.as("n1")
      .join(broadcast(probes.as("p")), col("p.u") === col("n1.x"))
      .filter(col("n1.y") =!= col("p.v"))
      // the wedge (u→w, u→v) closes iff canonical (v, w) is an edge —
      // checked against `all` (half the adjacency's width), the one
      // corpus-grain equi-join of the wedge phase
      .select(col("p.a").as("a"), col("p.b").as("b"),
        col("n1.ea").as("uw_a"), col("n1.eb").as("uw_b"),
        col("n1.en").as("uw_new"),
        least(col("p.v"), col("n1.y")).as("cy"),
        greatest(col("p.v"), col("n1.y")).as("cz"))
    val tri = cand
      .join(all.select(col("a").as("cy"), col("b").as("cz"),
        col("is_new").as("vw_new")), Seq("cy", "cz"))
      // attribution: the OTHER two edges must be old, or Δ-lower than
      // this probe edge — exactly one Δ edge (the max) owns a triangle
      .filter(
        (!col("uw_new") ||
          struct(col("uw_a"), col("uw_b")) < struct(col("a"), col("b"))) &&
        (!col("vw_new") ||
          struct(col("cy"), col("cz")) < struct(col("a"), col("b"))))
    val patch = tri.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("uw_a").as("a"), col("uw_b").as("b")),
        struct(col("cy").as("a"), col("cz").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("dsup"))
    // merge: the patch is batch-bounded → the stored support splits by
    // BROADCAST anti/semi (two scans, zero exchanges on the corpus
    // side): rows without a patch pass through untouched; rows with a
    // patch (batch-bounded) full-outer the patch so edges NEWLY on
    // ≥ 1 triangle appear — the stored table never shuffles.
    val (out, outBlocks) = checkpointDiff(sc) {
      val sup = oldSupport.select(col("a"), col("b"), col("support"))
      val keys = patch.select(col("a"), col("b"))
      val untouched = sup.join(broadcast(keys), Seq("a", "b"), "left_anti")
      val patchedSup = sup.join(broadcast(keys), Seq("a", "b"), "left_semi")
      untouched
        .unionAll(patchedSup.join(patch, Seq("a", "b"), "full_outer")
          .select(col("a"), col("b"),
            (coalesce(col("support"), lit(0L)) +
              coalesce(col("dsup"), lit(0L))).as("support")))
        .localCheckpoint()
    }
    release(sc, allBlocks)
    (out, outBlocks)
  }

  /** [[perEdgeDeltaDiff]] under the per-face generation map (slot
    * "perEdgeDelta") — for callers without block bookkeeping.
    */
  def perEdgeDelta(
      oldEdges: DataFrame, oldSupport: DataFrame, newEdges: DataFrame,
      src: String = "src", dst: String = "dst"): DataFrame =
    slotted("perEdgeDelta")(
      perEdgeDeltaDiff(oldEdges, oldSupport, newEdges, src, dst))

  /** Exact total triangle count (the scalar face). */
  def countTotal(edges: DataFrame, src: String = "src",
      dst: String = "dst"): Long = {
    val per = perNode(edges, src, dst)
    // every triangle credits 3 corners
    per.agg(sum(col("n_triangles"))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0) / 3
    }
  }
}
