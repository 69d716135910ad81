package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}

/** Ordered-sequence analytics with a PER-ADJACENT-STEP gap bound —
  * the ClickHouse `sequenceMatch('(?1)(?t<g)(?2)(?t<g)(?3)')` /
  * `sequenceCount(...)` surface (the second sequence-analytics family
  * the reference's backend ships natively, next to `windowFunnel` =
  * q26). The semantic difference from the funnel is WHERE the clock
  * anchors: windowFunnel bounds the whole chain within `window` of its
  * FIRST step; sequenceMatch bounds each ADJACENT pair — a slow but
  * steady view → click → purchase that takes 3 hours end-to-end with
  * 20-minute hops matches `(?t<30min)` adjacency but fails a 1-hour
  * funnel window, and vice versa for a burst at the end of a long idle
  * chain.
  *
  * Semantics, stated exactly (the spec's brute-force twin evaluates
  * this directly): MATCH iff there exist events e₁..e_n with
  * step(eᵢ) = i, ts(e₁) ≤ ts(e₂) ≤ … ≤ ts(e_n), and
  * ts(eᵢ₊₁) − ts(eᵢ) ≤ gap for every adjacent pair. COUNT = the
  * maximum number of pairwise non-overlapping such chains, where
  * chains are non-overlapping when each later chain's events all
  * follow the earlier chain's COMPLETING event in (ts, step) order —
  * the ClickHouse "search restarts after a match" rule.
  *
  * Evaluation is one pass over the group's step-matching events
  * sorted by (ts, step): `levels(i)` holds the LATEST timestamp at
  * which some chain completed its prefix of length i+1. Keeping only
  * the latest completion is exact: every candidate predecessor
  * timestamp is ≤ the current event's ts (sorted order), so the
  * adjacency test "∃ x achieved : ts − x ≤ gap" is monotone in x and
  * testing the maximum — itself achieved — decides it. For COUNT,
  * a completed chain increments the counter and resets every level
  * (greedy earliest-completion-first), which is maximum-cardinality
  * by the classic exchange argument: any optimal solution's first
  * chain completes no earlier than the greedy one, so substituting
  * the greedy chain leaves every later chain feasible.
  *
  * Buffer: the group's step-matching events (ts, step) — rows not
  * matching any step drop at update, merge concatenates, the sort
  * happens once at eval (the q26 state shape; mergeable at any
  * parallelism, map-side combinable).
  */
object SequenceAggregate {

  private val Unset = Long.MinValue

  /** Sentinel for "prefix not yet achieved" in a levels array — also
    * the initial value of a RESUMABLE fold's state (see [[resume]]).
    */
  private[graft] val UnsetLevel: Long = Unset

  /** The shared scan — package-visible so the spec can drive it on raw
    * sequences next to its brute-force twins. Returns (matched, count).
    */
  private[graft] def scan(
      events: collection.Seq[(Long, Int)], nSteps: Int,
      gapUs: Long): (Boolean, Long) = {
    val levels = Array.fill(math.max(nSteps - 1, 1))(Unset)
    val count =
      resume(levels, 0L, events.sortBy(identity), nSteps, gapUs)
    (count > 0L, count)
  }

  /** The RESUMABLE form of the fold — the DP state (the levels array +
    * the running count) is everything the scan carries between events,
    * so a stream can fold its watermark-finalized prefix into
    * `nSteps − 1` longs and discard the events (st21's exact state
    * bound; [[graft.streaming.Streams.sequenceCountStream]]). Mutates
    * `levels` in place, returns the new count. `sortedEvents` must be
    * (ts, step)-sorted and must follow (in time) everything already
    * folded — the caller's watermark contract.
    */
  private[graft] def resume(
      levels: Array[Long], count0: Long,
      sortedEvents: collection.Seq[(Long, Int)], nSteps: Int,
      gapUs: Long): Long = {
    var count = count0
    sortedEvents.foreach { case (ts, step) =>
      if (step == 1) {
        if (nSteps == 1) {
          count += 1L // a one-step chain completes immediately
        } else if (levels(0) == Unset || ts > levels(0)) {
          levels(0) = ts
        }
      } else if (levels(step - 2) != Unset &&
          ts - levels(step - 2) <= gapUs) {
        if (step == nSteps) {
          count += 1L
          java.util.Arrays.fill(levels, Unset) // greedy reset: disjoint chains
        } else if (levels(step - 1) == Unset || ts > levels(step - 1)) {
          levels(step - 1) = ts
        }
      }
    }
    count
  }

  private[functions] def ser(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 12 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (t, s) => bb.putLong(t); bb.putInt(s) }
    bb.array()
  }

  private[functions] def de(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { out += ((bb.getLong, bb.getInt)); i += 1 }
    out
  }

  /** Column form: does the chain 1..nSteps occur with every adjacent
    * gap ≤ gapUs? `ts` BIGINT microseconds, `step` INT in 1..nSteps
    * (other rows are ignored, like ClickHouse's unmatched conditions).
    */
  def sequenceMatch(
      ts: Column, step: Column, nSteps: Int, gapUs: Long): Column =
    GraftSqlBridge.column(
      SequenceMatchAggregate(GraftSqlBridge.expression(ts),
        GraftSqlBridge.expression(step), nSteps, gapUs)
        .toAggregateExpression())

  /** Column form: the number of non-overlapping chains (greedy
    * earliest-completion = the maximum, see class doc).
    */
  def sequenceCount(
      ts: Column, step: Column, nSteps: Int, gapUs: Long): Column =
    GraftSqlBridge.column(
      SequenceCountAggregate(GraftSqlBridge.expression(ts),
        GraftSqlBridge.expression(step), nSteps, gapUs)
        .toAggregateExpression())
}

/** Shared TypedImperativeAggregate plumbing for the two sequence
  * aggregates — the q26 buffer discipline: state is the group's
  * step-matching (ts, step) events only.
  */
sealed trait SequenceAggregateBase
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]] {
  self: Expression with BinaryLike[Expression] =>

  def left: Expression
  def right: Expression
  def nSteps: Int
  def gapUs: Long

  require(nSteps >= 1 && nSteps <= 32,
    s"$prettyName: n_steps must be in [1, 32], got $nSteps")
  require(gapUs >= 0,
    s"$prettyName: gap_us must be non-negative, got $gapUs")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BIGINT ts_us, INT step), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Long, Int)],
      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val t = left.eval(input)
    val s = right.eval(input)
    if (t != null && s != null) {
      // range-check on the WIDE value (the q26 rule): a corrupt BIGINT
      // step must be ignored, never truncated into the valid range
      val stepL = s match {
        case i: java.lang.Integer => i.longValue()
        case l: java.lang.Long => l.longValue()
      }
      if (stepL >= 1L && stepL <= nSteps.toLong)
        buf += ((t.asInstanceOf[java.lang.Long].longValue(), stepL.toInt))
    }
    buf
  }

  override def merge(
      b: ArrayBuffer[(Long, Int)],
      o: ArrayBuffer[(Long, Int)]): ArrayBuffer[(Long, Int)] = {
    b ++= o
    b
  }

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] =
    SequenceAggregate.ser(buf)

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] =
    SequenceAggregate.de(bytes)
}

/** `graft_sequence_match(ts_us, step, n_steps, gap_us)` → BOOLEAN. */
case class SequenceMatchAggregate(
    left: Expression,
    right: Expression,
    nSteps: Int,
    gapUs: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggregateBase with BinaryLike[Expression] {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sequence_match"

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any =
    SequenceAggregate.scan(buf, nSteps, gapUs)._1

  override def withNewMutableAggBufferOffset(o: Int): SequenceMatchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceMatchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceMatchAggregate =
    copy(left = newLeft, right = newRight)
}

/** `graft_sequence_count(ts_us, step, n_steps, gap_us)` → BIGINT. */
case class SequenceCountAggregate(
    left: Expression,
    right: Expression,
    nSteps: Int,
    gapUs: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends SequenceAggregateBase with BinaryLike[Expression] {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sequence_count"

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any =
    SequenceAggregate.scan(buf, nSteps, gapUs)._2

  override def withNewMutableAggBufferOffset(o: Int): SequenceCountAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SequenceCountAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SequenceCountAggregate =
    copy(left = newLeft, right = newRight)
}
