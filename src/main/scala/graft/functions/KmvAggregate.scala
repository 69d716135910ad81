package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct sketch (Bar-Yossef et al., "Counting
  * distinct elements in a data stream", RANDOM 2002; set-operation
  * estimators per Beyer et al., SIGMOD 2007): keep the `k` smallest
  * distinct 64-bit hashes of the values seen. Two aggregate faces
  * share the summary:
  *
  *   - [[KmvDistinctAggregate]] (`graft_kmv_distinct(v, k)`) evals to
  *     the distinct-count estimate as BIGINT;
  *   - [[KmvSketchAggregate]] (`graft_kmv_sketch(v, k)`) evals to the
  *     summary itself as `array<bigint>` (ascending, sign-flipped so
  *     natural order = unsigned hash order — an opaque payload), the
  *     composable form: [[Kmv.distinctEstimate]] /
  *     [[Kmv.jaccardEstimate]] / [[Kmv.intersectEstimate]] compute
  *     set-operation estimates from stored sketches WITHOUT rescanning
  *     the inputs — the "how many training docs do these two crawls
  *     share" question at 100 TB costs k longs per side.
  *
  * Guarantees:
  *   - the summary is a deterministic function of the value SET —
  *     insertion order, partitioning, and merge shape cannot change
  *     it (the k smallest distinct hashes are order-free), so results
  *     are stable across cluster sizes and AQE replans;
  *   - when the group's global distinct count is ≤ k the buffer never
  *     saturates and the estimate is EXACT (= buffer size) — the
  *     regime the DuckDB oracle gates (q25), the q23 discipline;
  *   - saturated, the estimator (k-1)/θ (θ = the k-th smallest hash
  *     mapped to (0,1]) is unbiased with relative standard error
  *     ~ 1/sqrt(k-2) — spec-gated on a >>k synthetic stream;
  *   - merge = union-then-trim, associative and commutative
  *     (mergeable summaries, Agarwal et al., PODS 2012).
  *
  * The 100 TB shape: one aggregation whose shuffle carries ≤ k longs
  * per (task, group) with map-side combine, where exact
  * COUNT(DISTINCT) shuffles the full value grain — and the persisted
  * sketch answers later union/intersection/Jaccard questions against
  * other corpora without touching either corpus again.
  */
object Kmv {

  private val seed = 42L

  /** Unsigned-order key of a value's hash: XXH64 of the UTF8 bytes,
    * sign bit flipped so SIGNED ascending = UNSIGNED hash ascending.
    */
  private[functions] def flippedHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), seed) ^ Long.MinValue

  /** Buffer: the k smallest flipped hashes (natural = unsigned order)
    * plus a DROPPED flag — true once any distinct hash was ever
    * rejected or evicted, i.e. the set stopped being the complete
    * distinct-hash set. The flag is what makes the exactness
    * guarantee hold INCLUSIVE of k distinct values: a buffer that is
    * full but never dropped anything still holds everything.
    */
  final class Buf extends Serializable {
    val set = new java.util.TreeSet[java.lang.Long]()
    var dropped = false
  }

  private[functions] def insert(buf: Buf, h: Long, k: Int): Unit = {
    if (buf.set.contains(h)) () // duplicate value: set stays complete
    else if (buf.set.size < k) { buf.set.add(h); () }
    else {
      buf.dropped = true // either h or the evicted max is lost
      if (h < buf.set.last()) { buf.set.pollLast(); buf.set.add(h); () }
    }
  }

  private[functions] def mergeBufs(b: Buf, o: Buf, k: Int): Buf = {
    b.set.addAll(o.set)
    b.dropped ||= o.dropped
    while (b.set.size > k) { b.set.pollLast(); b.dropped = true }
    b
  }

  /** Exact size while nothing was ever dropped (≤ k distinct —
    * INCLUSIVE); (k-1)/θ once saturated. The flipped k-th value maps
    * back to unsigned u = flipped + 2^63, θ = (u+1)/2^64 — one double
    * division of identical operands on every merge shape.
    */
  private[functions] def estimate(buf: Buf, k: Int): Long =
    if (!buf.dropped) buf.set.size.toLong
    else {
      val u = buf.set.last().toDouble + 9.223372036854775808e18
      math.round((k - 1).toDouble * 1.8446744073709551616e19 / (u + 1.0))
    }

  private[functions] def ser(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(5 + 8 * buf.set.size)
    bb.put(if (buf.dropped) 1.toByte else 0.toByte)
    bb.putInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  private[functions] def de(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Buf()
    out.dropped = bb.get() == 1.toByte
    val n = bb.getInt
    var i = 0
    while (i < n) { out.set.add(bb.getLong); i += 1 }
    out
  }

  /** Column form: distinct-count estimate as BIGINT. */
  def kmvDistinct(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvDistinctAggregate(GraftSqlBridge.expression(c), k)
        .toAggregateExpression())

  /** Column form: the mergeable sketch as array<bigint>. */
  def kmvSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvSketchAggregate(GraftSqlBridge.expression(c), k)
        .toAggregateExpression())

  /** Column form: fold STORED sketch rows (array<bigint>) into the
    * k-min of their union — [[KmvUnionAggregate]], the aggregate
    * behind `graft_kmv_union` and the SQL twin of
    * [[graft.sources.SketchStore.foldSketches]]'s column algebra.
    */
  def kmvUnion(sk: Column, k: Int): Column =
    GraftSqlBridge.column(
      KmvUnionAggregate(GraftSqlBridge.expression(sk), k)
        .toAggregateExpression())

  import org.apache.spark.sql.functions._

  /** k-min of the union of two stored sketches — the sketch OF the
    * union (KMV closure under union; ascending flipped order is
    * preserved by sort). Pure column composition over array<bigint>;
    * the SQL face is `graft_kmv_union` over two rows, or this
    * two-argument scalar via `graft_kmv_intersect`/`_jaccard`'s
    * internals.
    */
  def unionSketch(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct estimate from a stored sketch column (the
    * [[KmvDistinctAggregate]] estimator in column algebra). The array
    * form carries no dropped flag, so exactness here is STRICT
    * (size < k): a full array is treated as saturated — one distinct
    * value of headroom vs the aggregate's inclusive guarantee.
    */
  def distinctEstimate(sk: Column, k: Int): Column = {
    val kth = element_at(sk, k).cast("double") + lit(9.223372036854775808e18)
    when(size(sk) < k, size(sk).cast("long"))
      .otherwise(round(lit((k - 1).toDouble) * lit(1.8446744073709551616e19)
        / (kth + lit(1.0))).cast("long"))
  }

  /** Jaccard estimate from two stored sketches: the fraction of the
    * union's k-min that both sides contain (Beyer et al. 2007). Exact
    * when both sides were never saturated.
    */
  def jaccardEstimate(a: Column, b: Column, k: Int): Column = {
    val m = unionSketch(a, b, k)
    size(array_intersect(array_intersect(m, a), b)).cast("double") /
      greatest(size(m), lit(1)).cast("double")
  }

  /** Intersection-cardinality estimate: Jaccard × the union estimate,
    * both from the same merged k-min sketch.
    */
  def intersectEstimate(a: Column, b: Column, k: Int): Column =
    round(jaccardEstimate(a, b, k) *
      distinctEstimate(unionSketch(a, b, k), k).cast("double")).cast("long")
}

case class KmvDistinctAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buf]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv_distinct: k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_distinct requires STRING, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_distinct"

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf()

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null) // nulls are skipped, like count(col)
      Kmv.insert(buf, Kmv.flippedHash(v.asInstanceOf[UTF8String]), k)
    buf
  }

  override def merge(b: Kmv.Buf, o: Kmv.Buf): Kmv.Buf = Kmv.mergeBufs(b, o, k)
  override def eval(buf: Kmv.Buf): Any = Kmv.estimate(buf, k)
  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.ser(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.de(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KmvDistinctAggregate = copy(child = newChild)
}

/** The sketch-valued face — same buffer, evals to the ascending
  * flipped-hash array for storage and later set-op composition.
  */
case class KmvSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buf]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv_sketch: k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_sketch requires STRING, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_sketch"

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf()

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null)
      Kmv.insert(buf, Kmv.flippedHash(v.asInstanceOf[UTF8String]), k)
    buf
  }

  override def merge(b: Kmv.Buf, o: Kmv.Buf): Kmv.Buf = Kmv.mergeBufs(b, o, k)

  override def eval(buf: Kmv.Buf): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.ser(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.de(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KmvSketchAggregate = copy(child = newChild)
}

/** The UNION fold over STORED sketches — array<bigint> sketch rows in,
  * the k-min of their union out (the same ascending flipped-hash array
  * [[KmvSketchAggregate]] emits, so the result round-trips through
  * every stored-sketch estimator). This is the aggregate face of
  * [[graft.sources.SketchStore.foldSketches]]'s column algebra and the
  * piece that lets d15-style audits compose in PLAIN SQL:
  *
  * {{{
  *   SELECT a.source, b.source,
  *     graft_kmv_estimate(graft_kmv_union2(a.sk, b.sk, k), k) ...
  *   -- or fold a sketch history:
  *   SELECT source, graft_kmv_union(sk, k) FROM sketch_rows GROUP BY 1
  * }}}
  *
  * Mergeable like every KMV face (union-then-trim, associative and
  * commutative); the shuffle carries ≤ k longs per (task, group).
  */
case class KmvUnionAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buf]
  with UnaryLike[Expression] {

  require(k >= 2, s"graft_kmv_union: k must be >= 2, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_kmv_union requires ARRAY<BIGINT> (a stored sketch), " +
          s"got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kmv_union"

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf()

  override def update(buf: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < a.numElements()) { Kmv.insert(buf, a.getLong(i), k); i += 1 }
    }
    buf
  }

  override def merge(b: Kmv.Buf, o: Kmv.Buf): Kmv.Buf = Kmv.mergeBufs(b, o, k)

  override def eval(buf: Kmv.Buf): Any = {
    val out = new Array[Any](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.ser(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.de(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvUnionAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvUnionAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KmvUnionAggregate = copy(child = newChild)
}
