package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: every point row paired with every
  * interval row of the same key whose half-open window
  * `[start, end)` contains the point's timestamp. The classic uses:
  * attribution (events inside the window an impression opened),
  * validity-interval lookups (fact rows against slowly-changing dims
  * with effective ranges), sensor readings against maintenance windows.
  * Spark has no range-join optimization — the naive
  * `ON key AND ts >= start AND ts < end` plans as an equi-join on key
  * with the range as a residual filter, which expands
  * |points|·|intervals-per-key| intermediate rows (per-key quadratic,
  * the unblocked-dedup trap), or worse a BroadcastNestedLoopJoin when
  * no equi-key exists. DuckDB's native inequality join is the oracle.
  *
  * This implementation is the bin-decomposition form (the published
  * bucketed range-join used by Databricks' range-join hint and
  * GeoSpark-style 1-D partitioning): pick a bin width `w`, replicate
  * each interval to the `len/w + 1` bins it overlaps, tag each point
  * with its single bin, equi-join on `(key, bin)`, and keep only exact
  * containment. Because a point owns exactly ONE bin, each qualifying
  * (point, interval) pair meets exactly once — no post-join dedup.
  * Cost: one shuffled equi-join whose left side is unreplicated and
  * whose right side grows by at most `maxLen/w + 1`; with `w` ≈ the
  * typical interval length the blow-up is ≤ 2×. The join key
  * `(key, bin)` also splits a hot key across its time range, so key
  * skew that would melt a plain key-join spreads over bins for free.
  *
  * Bins floor-divide the LONG-cast timestamp (epoch seconds for
  * timestamps), via exact integral division — double division drifts
  * past 2^53 (see [[AsofJoin.joinBucketed]], same rationale).
  * Correctness does not depend on `w` (containment is re-checked
  * exactly); only the replication factor does. Intervals with
  * `end <= start` are empty under the half-open semantic and drop
  * before replication (a descending `sequence` would throw).
  *
  * Output: every point column, plus each interval column renamed with
  * `intervalPrefix` — only for points inside at least one window
  * (inner). Reference semantics: investigativedata/ftm-columnstore
  * keeps temporal validity on statements (`first_seen`/`last_seen`,
  * statements.py) but delegates range predicates to ClickHouse's
  * generic join; this operator is the scale-safe Spark form of that
  * predicate class.
  */
object IntervalJoin {

  // working columns used internally by both joins; an input frame
  // carrying one of these would be silently overwritten by withColumn
  private val Reserved = Seq("__bin", "__rk", "__rbin", "__ik")

  private def requireNoReserved(df: DataFrame, side: String): Unit = {
    val hit = df.columns.filter(Reserved.contains)
    require(hit.isEmpty,
      s"$side input carries reserved working column(s) " +
        s"${hit.mkString(", ")} — rename them before the join")
  }

  /** Exact floor(t / w) in LONG — IntegralDivide truncates toward
    * zero, so subtract 1 exactly when the remainder is negative.
    */
  private def binOf(c: Column, w: Long): Column = {
    val t = c.cast("long")
    val q0 = GraftSqlBridge.column(new IntegralDivide(
      GraftSqlBridge.expression(t),
      GraftSqlBridge.expression(lit(w))))
    val r = t - q0 * lit(w)
    q0 - when(r < 0, lit(1L)).otherwise(lit(0L))
  }

  /** Interval × interval OVERLAP join: every left interval paired with
    * every same-key right interval it intersects — half-open
    * `l.s < r.e AND r.s < l.e` (sessions × maintenance windows,
    * incident correlation, validity-range reconciliation). Same bin
    * decomposition as [[join]], with BOTH sides replicated; a
    * qualifying pair co-resides in every shared bin, so exactly-once
    * pairing needs a responsibility rule instead of [[join]]'s
    * one-bin-per-point argument: the pair is COUNTED only in
    * `max(bin(l.s), bin(r.s))` — the standard 1-D spatial-join
    * discipline. That bin always holds both rows: overlap gives
    * `l.s < r.e` and `r.s < l.e`, so the later start's bin is ≤ both
    * end bins, and each side trivially reaches its own start bin.
    * No post-join dedup, same superset-join + exact-recheck
    * correctness, same skew spreading.
    */
  def overlap(
      left: DataFrame, leftStart: String, leftEnd: String,
      right: DataFrame, rightStart: String, rightEnd: String,
      key: String, binWidth: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val rPayload = right.columns
      .filterNot(c => c == key || c == rightStart || c == rightEnd)
    val outRight = (Seq(rightStart, rightEnd) ++ rPayload)
      .map(rightPrefix + _).toSet
    val collisions = left.columns.filter(outRight.contains)
    require(collisions.isEmpty,
      s"overlap join: left columns ${collisions.mkString(", ")} " +
        s"collide with prefixed right output names; pick a " +
        s"different rightPrefix")
    requireNoReserved(left, "overlap join: left")
    requireNoReserved(right, "overlap join: right")
    def expand(df: DataFrame, s: String, e: String): DataFrame = df
      .filter(col(e) > col(s))
      .withColumn("__bin",
        explode(sequence(binOf(col(s), binWidth),
          binOf(col(e), binWidth))))
    val lExp = expand(left, leftStart, leftEnd)
    val rExp = expand(right, rightStart, rightEnd)
      .select((col(key).as("__rk") +: col("__bin").as("__rbin") +:
        (Seq(rightStart, rightEnd) ++ rPayload)
          .map(c => col(c).as(rightPrefix + c))): _*)
    val rs = col(rightPrefix + rightStart)
    val re = col(rightPrefix + rightEnd)
    lExp
      .join(rExp,
        lExp(key) === rExp("__rk") && lExp("__bin") === rExp("__rbin"))
      .filter(col(leftStart) < re && rs < col(leftEnd) &&
        col("__bin") === greatest(binOf(col(leftStart), binWidth),
          binOf(rs, binWidth)))
      .drop("__rk").drop("__bin").drop("__rbin")
  }

  def join(
      points: DataFrame, pointTs: String,
      intervals: DataFrame, start: String, end: String,
      key: String, binWidth: Long,
      intervalPrefix: String = "i_"): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val iPayload = intervals.columns
      .filterNot(c => c == key || c == start || c == end)
    val outRight = (Seq(start, end) ++ iPayload)
      .map(intervalPrefix + _).toSet
    val collisions = points.columns.filter(outRight.contains)
    require(collisions.isEmpty,
      s"interval join: point columns ${collisions.mkString(", ")} " +
        s"collide with prefixed interval output names; pick a " +
        s"different intervalPrefix")
    requireNoReserved(points, "interval join: points")
    requireNoReserved(intervals, "interval join: intervals")
    // replicate each non-empty interval to every bin it can touch; the
    // end bound is exclusive but bin(end) is kept — at most one
    // spurious bin per interval, removed by the exact filter below
    val expanded = intervals
      .filter(col(end) > col(start))
      .withColumn("__bin",
        explode(sequence(binOf(col(start), binWidth),
          binOf(col(end), binWidth))))
      .select((col(key).as("__ik") +: col("__bin") +:
        (Seq(start, end) ++ iPayload)
          .map(c => col(c).as(intervalPrefix + c))): _*)
    val tagged = points.withColumn("__bin", binOf(col(pointTs), binWidth))
    tagged
      .join(expanded,
        tagged(key) === expanded("__ik") &&
          tagged("__bin") === expanded("__bin"))
      .filter(col(pointTs) >= col(intervalPrefix + start) &&
        col(pointTs) < col(intervalPrefix + end))
      .drop("__ik").drop("__bin")
  }
}
