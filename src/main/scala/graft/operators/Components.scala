package graft.operators

import org.apache.spark.SparkContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the shared engine behind
  * judgement-driven entity canonicalization ([[Xref.resolverMapping]])
  * and near-dup document clustering ([[Dedup.nearDupClusters]]).
  *
  * Two interchangeable algorithms, same contract (see [[minLabel]]):
  *
  *   - [[minLabel]] — iterative min-label propagation, one equi-join +
  *     one map-side-combined aggregation per round, converging in
  *     O(component diameter) rounds. The default: blocking/LSH
  *     candidate graphs are near-cliques, so the diameter is tiny at
  *     any data scale and the per-round plan is the cheapest possible.
  *   - [[minLabelStars]] — alternating large-star/small-star
  *     (Kiveris et al., "Connected Components in MapReduce and
  *     Beyond", SOCC'14): each round REWIRES edges toward component
  *     minima instead of propagating labels one hop, converging in
  *     O(log n) rounds regardless of diameter. Reach for it when the
  *     graph can contain long chains — e.g. judgement graphs where
  *     merges arrive pairwise (a→b, b→c, c→d …) and the diameter
  *     grows with history length.
  */
object Components {

  /** Diff-based tracking of the block-manager ids a round's
    * localCheckpoint pins, so superseded rounds can be dropped —
    * otherwise every iteration's snapshot stays cached for the app's
    * lifetime.
    *
    * SINGLE-WRITER ASSUMPTION: the ids are identified by diffing the
    * GLOBAL `sc.getPersistentRDDs` key set around `body`; any RDD
    * persisted concurrently by another thread sharing this
    * SparkContext during that window would be attributed to this loop
    * and unpersisted from under its owner. Fine for batch pipelines
    * and the bench (one driver thread); a multi-tenant driver should
    * serialize component runs or accept recomputation of the victim's
    * cache.
    */
  private[graft] def checkpointDiff[A](sc: SparkContext)(body: => A)
      : (A, Set[Int]) = {
    val before = sc.getPersistentRDDs.keySet.toSet
    val r = body
    (r, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  private[graft] def release(sc: SparkContext, blocks: Set[Int]): Unit =
    blocks.foreach(id =>
      sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))

  /** `spark.sql.shuffle.partitions` as an Int — the session scale knob
    * the explicit repartitions read (Fpx.expandSortedSets, LabelProp's
    * edge exchange). GraftSession always sets an integer, but a session
    * configured with a non-numeric value (Spark accepts "auto" with
    * some catalogs) would otherwise throw NumberFormatException at
    * plan-build time; fall back to the scheduler's default parallelism
    * (r15 ADVICE).
    */
  private[operators] def shufflePartitions(df: DataFrame): Int =
    df.sparkSession.conf.get("spark.sql.shuffle.partitions")
      .toIntOption
      .getOrElse(df.sparkSession.sparkContext.defaultParallelism)

  /** `edges`: directed (src, dst) rows, any element type with a total
    * order (string ids, long ids); symmetrized and deduplicated
    * internally. Returns (id, label) for every vertex that appears in
    * an edge, `label` = the component's minimum vertex id.
    *
    * Throws if `maxIter` rounds pass without convergence: an
    * unconverged label map is WRONG (vertices of one component carry
    * different labels), and every caller — judgement canonicalization,
    * near-dup clustering — would silently split clusters. A graph that
    * legitimately needs more rounds (diameter > maxIter) should switch
    * to [[minLabelStars]] (O(log n) rounds) or raise the bound
    * explicitly rather than get a wrong answer quietly.
    */
  def minLabel(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = edges0.sparkSession.sparkContext
    val und = edges0.select(col("src"), col("dst"))
    val (edges, edgeBlocks) = checkpointDiff(sc) {
      und
        .union(und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
    }
    var (labels, labelBlocks) = checkpointDiff(sc) {
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
      // ONE driver action per round (r16): a LAZY checkpoint whose
      // materializing action IS the convergence count. The persist
      // hooks the RDD iterator below Catalyst, so whatever query runs
      // on top, the blocks cache the checkpoint RDD's FULL rows — the
      // count's plan-level pruning cannot reach inside the RDD
      // boundary — and the count visits every partition, so the whole
      // snapshot is materialized in the same job (the old form paid a
      // checkpoint job PLUS a count job per round).
      val (updated, newBlocks) = checkpointDiff(sc) {
        labels.join(nbr, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nlabel"), col("label")))
              .as("label"),
            (col("nlabel") < col("label")).as("__chg"))
          .localCheckpoint(false)
      }
      changed = updated.filter(col("__chg")).count()
      // previous round's checkpoint is superseded — release its blocks
      release(sc, labelBlocks)
      labelBlocks = newBlocks
      labels = updated.drop("__chg")
      iter += 1
    }
    if (changed > 0) {
      // release the loop's pinned blocks BEFORE failing — the throw
      // must not leak the final label snapshot + edge set into the
      // block manager for the app's lifetime
      release(sc, labelBlocks)
      release(sc, edgeBlocks)
      throw new IllegalStateException(
        s"Components.minLabel did not converge in $maxIter rounds " +
          s"($changed labels still changing); component diameter exceeds " +
          "maxIter — use minLabelStars (O(log n) rounds) or raise it " +
          "(labels would be silently wrong)")
    }
    // the final labels checkpoint is eager, so it no longer reads edges
    release(sc, edgeBlocks)
    labels
  }

  /** Same contract as [[minLabel]], via alternating
    * large-star/small-star edge rewiring (Kiveris et al., SOCC'14):
    *
    *   - large-star(u): every neighbor v > u re-attaches to
    *     m = min(N(u) ∪ u) — tall trees flatten toward minima;
    *   - small-star(u): u and its smaller neighbors all attach to the
    *     smallest — stars contract.
    *
    * Each half-round is one aggregate + one equi-join on edge rows
    * (the same per-round plan cost as a [[minLabel]] round), but the
    * round COUNT is O(log n) in the graph size instead of
    * O(diameter) — a pairwise-merge judgement chain of length 10⁶
    * converges in ~20 rounds here vs 10⁶ there. Fixed point is
    * detected by a (count, hash-sum) signature of the edge set; the
    * final labels are then exactly validated against the ORIGINAL
    * edges (every edge must connect same-label vertices), so a
    * signature collision cannot smuggle out a wrong answer — the same
    * loud-failure contract as [[minLabel]].
    */
  def minLabelStars(edges0: DataFrame, maxIter: Int = 50): DataFrame = {
    val sc = edges0.sparkSession.sparkContext
    val und = edges0.select(col("src"), col("dst"))
    // symmetric original edges: the vertex universe (self-loops keep a
    // vertex alive even with no real neighbors) and the final validator
    val (orig, origBlocks) = checkpointDiff(sc) {
      und
        .union(und.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint()
    }

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy(col("src"))
        .agg(least(col("src"), min(col("dst"))).as("__m"))
      sym.join(m, Seq("src"))
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("__m").as("dst"))
        .distinct()
    }

    def smallStar(e: DataFrame): DataFrame = {
      val dir = e.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
        .filter(col("src") =!= col("dst"))
      val m = dir.groupBy(col("src")).agg(min(col("dst")).as("__m"))
      dir.join(m, Seq("src"))
        .filter(col("dst") =!= col("__m"))
        .select(col("dst").as("src"), col("__m").as("dst"))
        .union(m.select(col("src"), col("__m").as("dst")))
        .distinct()
    }

    def signature(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        coalesce(sum(xxhash64(col("src"), col("dst")).cast("decimal(38,0)")),
          lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"))).head()
      (r.getLong(0), r.getDecimal(1))
    }

    var (e, eBlocks) = checkpointDiff(sc) {
      orig.filter(col("src") =!= col("dst")).localCheckpoint(false)
    }
    var sig = signature(e)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // lazy checkpoint + the signature aggregate as its materializing
      // action: one driver action per round instead of two (the
      // minLabel rationale above — the RDD-level persist caches full
      // rows regardless of what the signature's plan prunes)
      val (next, newBlocks) = checkpointDiff(sc) {
        smallStar(largeStar(e)).localCheckpoint(false)
      }
      val nextSig = signature(next)
      release(sc, eBlocks)
      eBlocks = newBlocks
      e = next
      converged = nextSig == sig
      sig = nextSig
      iter += 1
    }
    if (!converged) {
      release(sc, eBlocks)
      release(sc, origBlocks)
      throw new IllegalStateException(
        s"Components.minLabelStars did not converge in $maxIter rounds — " +
          "raise maxIter (labels would be silently wrong)")
    }
    // at the fixed point every edge points (vertex → component min):
    // vertices absent as src are roots (or isolated) and label themselves
    val pointed = e.groupBy(col("src")).agg(min(col("dst")).as("label"))
      .select(col("src").as("id"), col("label"))
    val labels = orig.select(col("src").as("id")).distinct()
      .join(pointed, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("label"))
    // exact validation against the original edges: a signature
    // collision (or a bug) cannot survive this — fail loud like
    // minLabel's non-convergence throw
    val lSrc = labels.select(col("id").as("src"), col("label").as("__ls"))
    val lDst = labels.select(col("id").as("dst"), col("label").as("__ld"))
    val bad = orig.join(lSrc, Seq("src")).join(lDst, Seq("dst"))
      .filter(col("__ls") =!= col("__ld")).count()
    if (bad > 0) {
      release(sc, eBlocks)
      release(sc, origBlocks)
      throw new IllegalStateException(
        s"Components.minLabelStars produced a split component " +
          s"($bad edges cross labels) — fixed-point signature collided")
    }
    // eager checkpoint of the result, then release the loop's blocks
    // (the result's own blocks stay pinned — they ARE the answer)
    val out = labels.localCheckpoint()
    release(sc, eBlocks)
    release(sc, origBlocks)
    out
  }
}
