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

  // the PREVIOUS perNode call's (small, node-grain) result blocks —
  // released when a new census starts, so a bench/suite loop that
  // calls f26 many times holds ONE generation of result state, not
  // the session's whole history. Single-generation contract: consume
  // (collect/write) each census before requesting the next one, or
  // persist the frame yourself.
  private var lastResultBlocks: Set[Int] = Set.empty

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

  private def census(edges: DataFrame, src: String, dst: String)(
      finish: DataFrame => DataFrame): DataFrame = synchronized {
    val sc = edges.sparkSession.sparkContext
    import Components.{checkpointDiff, release}
    release(sc, lastResultBlocks)
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
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
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
    lastResultBlocks = outBlocks
    out
  }

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
