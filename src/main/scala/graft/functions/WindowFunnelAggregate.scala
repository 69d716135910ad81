package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Sliding-window funnel depth — the ClickHouse `windowFunnel()`
  * surface (the sequence-analytics aggregate the reference's backend
  * ships natively and Spark has no analogue for):
  * `graft_window_funnel(ts_us, step, n_steps, window_us)` returns, per
  * group, the deepest prefix of the step sequence 1..n completed as a
  * chain with NON-DECREASING timestamps in which every step lands
  * within `window_us` of the CHAIN'S FIRST step (ClickHouse default
  * mode: ties chain, the window anchors at step 1).
  *
  * Semantics, stated exactly (the spec's brute-force twin evaluates
  * this directly): depth ≥ k iff there exist events e₁..e_k with
  * step(eᵢ) = i, ts(e₁) ≤ ts(e₂) ≤ … ≤ ts(e_k), and
  * ts(e_k) ≤ ts(e₁) + window. With `strictIncrease` (the ClickHouse
  * `strict_increase` mode) the chain comparisons become STRICT
  * (ts(e₁) < ts(e₂) < …): simultaneous events can no longer chain —
  * the dedup guard for feeds whose steps share one coarse timestamp.
  *
  * Evaluation is the classic single-pass greedy over the group's
  * step-matching events sorted by (ts, step): `levels(i)` holds the
  * LATEST chain-start timestamp among chains that have reached step
  * i+1 — keeping the latest start dominates (any chain a discarded
  * earlier start could still complete, the kept later start completes
  * too, with more window to spare), so greedy depth = the exists-max
  * depth. Equal-timestamp events process lower-step-first, which is
  * exactly the ≤ chain rule.
  *
  * Buffer: the group's step-matching events (ts, step) — events not
  * matching any step are dropped at update, so state is funnel-event-
  * bounded, not event-bounded. Merge concatenates (sort happens once
  * at eval), so partials combine map-side like any mergeable summary.
  * This is the ClickHouse state shape; a group whose funnel events
  * themselves are corpus-sized belongs in a sessionized pre-filter.
  */
case class WindowFunnelAggregate(
    left: Expression,
    right: Expression,
    nSteps: Int,
    windowUs: Long,
    strictIncrease: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Int)]]
  with BinaryLike[Expression] {

  require(nSteps >= 1 && nSteps <= 32,
    s"graft_window_funnel: n_steps must be in [1, 32], got $nSteps")
  require(windowUs > 0,
    s"graft_window_funnel: window_us must be positive, got $windowUs")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_window_funnel requires (BIGINT ts_us, INT step), got " +
          s"(${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_window_funnel"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Int)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Long, Int)],
      input: InternalRow): ArrayBuffer[(Long, Int)] = {
    val t = left.eval(input)
    val s = right.eval(input)
    if (t != null && s != null) {
      // range-check on the WIDE value: a corrupt BIGINT step like
      // 2^32+1 must be ignored like any unmatched condition, not
      // truncated into the valid range
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

  override def eval(buf: ArrayBuffer[(Long, Int)]): Any =
    WindowFunnelAggregate.depth(buf, nSteps, windowUs, strictIncrease)

  override def serialize(buf: ArrayBuffer[(Long, Int)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 12 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (t, s) => bb.putLong(t); bb.putInt(s) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Int)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[(Long, Int)](n)
    var i = 0
    while (i < n) { out += ((bb.getLong, bb.getInt)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): WindowFunnelAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WindowFunnelAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WindowFunnelAggregate =
    copy(left = newLeft, right = newRight)
}

object WindowFunnelAggregate {

  private val Unset = Long.MinValue

  /** The greedy pass — package-visible so the spec can drive it on
    * raw sequences next to its brute-force exists-twin.
    */
  private[graft] def depth(
      events: collection.Seq[(Long, Int)], nSteps: Int,
      windowUs: Long, strictIncrease: Boolean = false): Long = {
    val sorted = events.sortBy(identity) // (ts, step): ties step-ascending
    val levels = Array.fill(nSteps)(Unset)
    if (!strictIncrease) {
      sorted.foreach { case (ts, step) =>
        if (step == 1) {
          if (levels(0) == Unset || ts > levels(0)) levels(0) = ts
        } else if (levels(step - 2) != Unset &&
            ts - levels(step - 2) <= windowUs) {
          val start = levels(step - 2)
          if (levels(step - 1) == Unset || start > levels(step - 1))
            levels(step - 1) = start
        }
      }
    } else {
      // STRICT INCREASE (ClickHouse 'strict_increase'): chain
      // timestamps must strictly grow, so an event may extend only a
      // level reached at an EARLIER timestamp. Events sharing one
      // timestamp read a SNAPSHOT of the pre-group state and their
      // updates merge afterwards — a same-ts chain can never form,
      // and max-start dominance still holds exactly (any entry the
      // snapshot exposes was reached strictly earlier, and for later
      // groups every entry qualifies, so the max is the right one).
      var i = 0
      val n = sorted.length
      val snap = Array.fill(nSteps)(Unset)
      while (i < n) {
        val ts = sorted(i)._1
        var j = i
        while (j < n && sorted(j)._1 == ts) j += 1
        System.arraycopy(levels, 0, snap, 0, nSteps)
        var k = i
        while (k < j) {
          val step = sorted(k)._2
          if (step == 1) {
            if (levels(0) == Unset || ts > levels(0)) levels(0) = ts
          } else if (snap(step - 2) != Unset &&
              ts - snap(step - 2) <= windowUs) {
            val start = snap(step - 2)
            if (levels(step - 1) == Unset || start > levels(step - 1))
              levels(step - 1) = start
          }
          k += 1
        }
        i = j
      }
    }
    var d = 0
    while (d < nSteps && levels(d) != Unset) d += 1
    d.toLong
  }

  /** Column form: `ts` BIGINT microseconds, `step` INT in 1..nSteps
    * (0/out-of-range rows are ignored, like ClickHouse's unmatched
    * conditions).
    */
  def windowFunnel(
      ts: Column, step: Column, nSteps: Int, windowUs: Long,
      strictIncrease: Boolean = false): Column =
    GraftSqlBridge.column(
      WindowFunnelAggregate(GraftSqlBridge.expression(ts),
        GraftSqlBridge.expression(step), nSteps, windowUs, strictIncrease)
        .toAggregateExpression())
}
