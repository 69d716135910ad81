package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
  * the standard "draw a 2M-point series on a 2k-pixel chart" reduction
  * (ClickHouse ships it as `largestTriangleThreeBuckets`):
  * `graft_lttb(t, v, n_out)` returns, per group, the `n_out` points
  * that preserve the series' visual shape — first and last points
  * always kept, each middle bucket contributing the point that forms
  * the LARGEST TRIANGLE with the previously selected point and the
  * next bucket's centroid (peaks and troughs survive where avg/minmax
  * resampling flattens them).
  *
  * Everything is INTEGER-EXACT, so the DuckDB oracle (the same greedy
  * unrolled as chained argmax CTEs — the s8 discipline) hash-gates
  * every selected point:
  *   - bucket of middle index i (1-based within the n−2 middle
  *     points) = ((i−1)·(n_out−2)) div (n−2) — integer floor, the
  *     same partition as the float boundaries in the paper;
  *   - the triangle argmax compares areas scaled by the next bucket's
  *     size m (constant within a bucket, so order-preserving):
  *     score = |(t_p·m − Σt_next)·(v_b − v_p) − (t_p − t_b)·(Σv_next − v_p·m)|
  *     — exact longs (bound: |t|·m·|Δv| < 2⁶³; holds for epoch-hour
  *     t ≈ 5·10⁵, series ≤ 10⁵ points, counts ≤ 10⁹);
  *   - ties select the earliest t.
  *
  * Buffer: the group's (t, v) points. For the telemetry shape this
  * serves (one point per time bucket per series) state is bounded by
  * the series' TIME SPAN, not the corpus — the q26/q30 state
  * discipline. Merge concatenates; the one sort happens at eval.
  * Series with n ≤ n_out pass through complete (nothing to drop).
  */
case class LttbAggregate(
    left: Expression,
    right: Expression,
    nOut: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[(Long, Long)]]
  with BinaryLike[Expression] {

  require(nOut >= 3, s"graft_lttb: n_out must be >= 3, got $nOut")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_lttb requires (BIGINT t, BIGINT v), got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LttbAggregate.schema
  override def nullable: Boolean = false
  override def prettyName: String = "graft_lttb"

  override def createAggregationBuffer(): ArrayBuffer[(Long, Long)] =
    ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Long, Long)],
      input: InternalRow): ArrayBuffer[(Long, Long)] = {
    val t = left.eval(input)
    val v = right.eval(input)
    if (t != null && v != null)
      buf += ((t.asInstanceOf[java.lang.Long].longValue(),
        v.asInstanceOf[java.lang.Long].longValue()))
    buf
  }

  override def merge(
      b: ArrayBuffer[(Long, Long)],
      o: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b ++= o
    b
  }

  override def eval(buf: ArrayBuffer[(Long, Long)]): Any = {
    val sel = LttbAggregate.select(buf, nOut)
    new GenericArrayData(sel.map { case (t, v) =>
      new GenericInternalRow(Array[Any](t, v)) })
  }

  override def serialize(buf: ArrayBuffer[(Long, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (t, v) => bb.putLong(t); bb.putLong(v) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val out = new ArrayBuffer[(Long, Long)](n)
    var i = 0
    while (i < n) { out += ((bb.getLong, bb.getLong)); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): LttbAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): LttbAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LttbAggregate =
    copy(left = newLeft, right = newRight)
}

object LttbAggregate {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("t", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)

  /** The selection pass — package-visible so the spec can drive it on
    * raw series next to a literal re-implementation.
    */
  private[graft] def select(
      points: collection.Seq[(Long, Long)], nOut: Int)
      : Seq[(Long, Long)] = {
    val sorted = points.sortBy(identity).toIndexedSeq
    val n = sorted.length
    if (n <= nOut) return sorted.toSeq
    val mid = nOut - 2
    val nMid = n - 2
    // bucket k's middle points: 1-based middle index i with
    // ((i-1)*mid) / nMid == k  (floor) — contiguous, all non-empty
    def bucketStart(k: Int): Int = { // first 0-based sorted index of bucket k
      // smallest i (1-based) with (i-1)*mid >= k*nMid  ⇒ i-1 = ceil(k*nMid/mid)
      1 + ((k.toLong * nMid + mid - 1) / mid).toInt
    }
    val out = ArrayBuffer[(Long, Long)](sorted.head)
    var prev = sorted.head
    var k = 0
    while (k < mid) {
      val lo = bucketStart(k)
      val hi = if (k == mid - 1) n - 2 else bucketStart(k + 1) - 1
      // next anchor: centroid sums of bucket k+1, or the last point
      val (tcs, vcs, m) =
        if (k == mid - 1) (sorted(n - 1)._1, sorted(n - 1)._2, 1L)
        else {
          val nlo = bucketStart(k + 1)
          val nhi = if (k + 1 == mid - 1) n - 2 else bucketStart(k + 2) - 1
          var ts = 0L; var vs = 0L; var i = nlo
          while (i <= nhi) { ts += sorted(i)._1; vs += sorted(i)._2; i += 1 }
          (ts, vs, (nhi - nlo + 1).toLong)
        }
      var best = sorted(lo)
      var bestScore = -1L
      var i = lo
      while (i <= hi) {
        val (tb, vb) = sorted(i)
        val score = math.abs(
          (prev._1 * m - tcs) * (vb - prev._2) -
            (prev._1 - tb) * (vcs - prev._2 * m))
        if (score > bestScore) { bestScore = score; best = sorted(i) }
        i += 1
      }
      out += best
      prev = best
      k += 1
    }
    out += sorted(n - 1)
    out.toSeq
  }

  /** Column form: `t`, `v` BIGINT; returns array<struct<t, v>> of the
    * `nOut` selected points in t order.
    */
  def lttb(t: Column, v: Column, nOut: Int): Column =
    GraftSqlBridge.column(
      LttbAggregate(GraftSqlBridge.expression(t),
        GraftSqlBridge.expression(v), nOut).toAggregateExpression())
}
