package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Per-node triangle counts. `edges` carries one row per (possibly
    * duplicated, possibly reversed) undirected edge in columns
    * (`src`, `dst`); self-loops are dropped, duplicates collapsed.
    * Returns (node, n_triangles) for every node on ≥ 1 triangle.
    */
  def perNode(edges: DataFrame, src: String = "src",
      dst: String = "dst"): DataFrame = {
    // canonical undirected edge set: a < b, no loops, no dups.
    // e and oriented are each consumed by TWO downstream branches
    // (orientation + closing lookup; both wedge sides) — materialized
    // once via localCheckpoint (the f20b discipline) so the lineage
    // branches read blocks instead of re-running the distinct/joins.
    // Deliberately NOT the PageRank eager-release form: measured
    // in-suite, eager materialization + release moved no time off f26
    // (the in-suite spread is suite-level shuffle/IO state, the
    // documented d15 phenomenon) and slowed its bench successors
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("d"))
    // orient a→b when (d(a), a) < (d(b), b); a < b already, so the
    // tie case keeps the canonical direction
    val oriented = e
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
        when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
      .localCheckpoint()
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
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
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
