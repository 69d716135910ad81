package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** KLL quantile sketch (Karnin, Lang, Liberty, "Optimal quantile
  * approximation in streams", FOCS 2016) — the MERGEABLE rank/quantile
  * summary that completes the stored-sketch trio next to KMV
  * cardinality ([[Kmv]]) and Misra–Gries heavy hitters
  * ([[TopKAggregate]]): "what is the live p50/p95/p99 of this column,
  * per group, across 100 TB" as ONE aggregation whose shuffle carries
  * a ~k-item summary per (task, group) with map-side combine — where
  * the exact path (`percentile`/sort) shuffles the full value grain.
  *
  * Structure: a stack of weighted buffers ("compactors") — items at
  * level h carry weight 2^h. Inserts land in level 0 at weight 1; when
  * total size exceeds total capacity the lowest over-capacity level is
  * sorted and every second item is promoted to the level above (half
  * the items, double the weight — total weight is preserved), so space
  * stays O(k) while n grows unboundedly. Level capacities decay
  * geometrically below the top (c = 2/3 here, the paper's constant):
  * the oldest, heaviest levels get the most headroom.
  *
  * Guarantees:
  *   - while a group's total row count n ≤ k, NO compaction ever fires
  *     (on any merge shape: compaction triggers only past total
  *     capacity ≥ k), the summary is the complete sorted multiset and
  *     every quantile is EXACT — the regime the DuckDB oracle gates
  *     (q30, the q25/q23 discipline). Rank rule in that regime:
  *     quantile(p) = the ceil(p·n)-th smallest value, which is exactly
  *     DuckDB's `quantile_disc`;
  *   - saturated, the rank error is ε·n with ε = O(1/k) for a fixed
  *     level count (KLL §3; the general bound is
  *     O(sqrt(log(n/k))/k)) — spec-gated empirically on a ≫k stream,
  *     fold-shape-stressed;
  *   - merge = per-level concatenation + the same compaction rule
  *     (mergeable summaries, Agarwal et al., PODS 2012): merging
  *     per-partition or per-batch sketches carries the same bound as
  *     one sketch over the concatenated stream;
  *   - compaction coin flips are DERANDOMIZED (a counter-derived bit,
  *     not a RNG) so a given update/merge sequence is reproducible;
  *     unlike KMV the saturated summary is still a function of merge
  *     ORDER — the error bound, not the bit pattern, is the contract,
  *     which is why q30 pins the exact regime and the saturated regime
  *     is bound-spec'd, never hash-gated.
  *
  * Three faces share the summary (the [[Kmv]] layout):
  *   - [[KllSketchAggregate]] (`graft_quantile_sketch(v, k)`) — the
  *     sketch itself as a flat `array<bigint>` (an opaque payload:
  *     `[n, numLevels, len_0, items_0 ascending…, len_1, …]`), the
  *     composable/storable form;
  *   - [[KllMergeAggregate]] (`graft_quantile_merge(sk, k)`) — fold
  *     STORED sketch rows into one, without rescanning any corpus
  *     (the [[graft.sources.QuantileStore]] serving fold);
  *   - [[KllValueExpression]] (`graft_quantile_value(sk, p)`) /
  *     [[KllRankExpression]] (`graft_quantile_rank(sk, v)`) — scalar
  *     rank-select / rank lookup over a stored sketch (evaluated at
  *     summary grain — one row per group — never the value grain).
  */
object Kll {

  private val MinLevelCap = 2
  /** Geometric capacity decay per level below the top: 2/3. */
  private def levelCap(k: Int, numLevels: Int, h: Int): Int = {
    // cap(top) = k, each level below shrinks by 2/3, floor at 2
    var cap = k.toDouble
    var i = numLevels - 1
    while (i > h) { cap = cap * 2.0 / 3.0; i -= 1 }
    math.max(MinLevelCap, math.ceil(cap).toInt)
  }

  /** Mutable aggregation state: one growable buffer per level (level h
    * items weigh 2^h; level 0 is the unsorted ingest buffer), total
    * weight n, and the compaction counter that drives the
    * derandomized coin.
    */
  final class Buf(val k: Int) extends Serializable {
    var n: Long = 0L
    var compactions: Long = 0L
    val levels: ArrayBuffer[ArrayBuffer[Long]] =
      ArrayBuffer(ArrayBuffer.empty[Long])

    def totalItems: Int = {
      var s = 0; var h = 0
      while (h < levels.length) { s += levels(h).length; h += 1 }
      s
    }
  }

  /** Derandomized compaction coin: a bit mixed from the buffer's
    * compaction count and the level — reproducible for a given
    * update/merge sequence (class doc), alternating-ish in practice.
    */
  private def coin(buf: Buf, h: Int): Int = {
    val x = buf.compactions * 0x9E3779B97F4A7C15L + h * 0xC2B2AE3D27D4EB4FL
    (((x ^ (x >>> 33)) >>> 13) & 1L).toInt
  }

  /** Compact the lowest over-capacity level: sort, keep one leftover
    * if the length is odd (the largest stays in place), promote every
    * second item of the even prefix to the level above. Total weight
    * is invariant (m even items at weight w become m/2 at weight 2w).
    */
  private def compress(buf: Buf): Unit = {
    var guard = 0
    while (overCap(buf) && guard < 64) {
      val nl = buf.levels.length
      var h = 0
      var done = false
      while (h < nl && !done) {
        val lv = buf.levels(h)
        if (lv.length >= levelCap(buf.k, nl, h) && lv.length >= 2) {
          compactLevel(buf, h)
          done = true
        }
        h += 1
      }
      if (!done) return // nothing compactable (all levels < 2 items)
      guard += 1
    }
  }

  private def overCap(buf: Buf): Boolean = {
    val nl = buf.levels.length
    var cap = 0; var h = 0
    while (h < nl) { cap += levelCap(buf.k, nl, h); h += 1 }
    buf.totalItems > cap
  }

  private def compactLevel(buf: Buf, h: Int): Unit = {
    val lv = buf.levels(h)
    val sorted = lv.toArray
    java.util.Arrays.sort(sorted)
    val even = sorted.length - (sorted.length & 1)
    val off = coin(buf, h)
    buf.compactions += 1
    if (h + 1 >= buf.levels.length) buf.levels += ArrayBuffer.empty[Long]
    val up = buf.levels(h + 1)
    var i = off
    while (i < even) { up += sorted(i); i += 2 }
    lv.clear()
    if (even < sorted.length) lv += sorted(even) // odd leftover keeps weight
  }

  private[functions] def insert(buf: Buf, v: Long): Unit = {
    buf.levels(0) += v
    buf.n += 1L
    compress(buf)
  }

  private[functions] def mergeBufs(b: Buf, o: Buf): Buf = {
    var h = 0
    while (h < o.levels.length) {
      if (h >= b.levels.length) b.levels += ArrayBuffer.empty[Long]
      b.levels(h) ++= o.levels(h)
      h += 1
    }
    b.n += o.n
    b.compactions += o.compactions
    compress(b)
    b
  }

  /** Ingest a FLAT stored sketch (the eval encoding) into a buffer at
    * matching heights — the [[KllMergeAggregate]] update step.
    */
  private[functions] def ingestFlat(buf: Buf, a: ArrayData): Unit = {
    if (a.numElements() < 2) return
    val n = a.getLong(0)
    val nl = a.getLong(1).toInt
    var idx = 2
    var h = 0
    while (h < nl) {
      val len = a.getLong(idx).toInt; idx += 1
      if (h >= buf.levels.length) buf.levels += ArrayBuffer.empty[Long]
      val lv = buf.levels(h)
      var i = 0
      while (i < len) { lv += a.getLong(idx + i); i += 1 }
      idx += len
      h += 1
    }
    buf.n += n
    compress(buf)
  }

  private[functions] def ser(buf: Buf): Array[Byte] = {
    val items = buf.totalItems
    val bb = ByteBuffer.allocate(8 + 8 + 4 + buf.levels.length * 4 + items * 8)
    bb.putLong(buf.n)
    bb.putLong(buf.compactions)
    bb.putInt(buf.levels.length)
    var h = 0
    while (h < buf.levels.length) {
      val lv = buf.levels(h)
      bb.putInt(lv.length)
      var i = 0
      while (i < lv.length) { bb.putLong(lv(i)); i += 1 }
      h += 1
    }
    bb.array()
  }

  private[functions] def de(bytes: Array[Byte], k: Int): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Buf(k)
    out.n = bb.getLong
    out.compactions = bb.getLong
    val nl = bb.getInt
    var h = 0
    while (h < nl) {
      if (h >= out.levels.length) out.levels += ArrayBuffer.empty[Long]
      val len = bb.getInt
      val lv = out.levels(h)
      var i = 0
      while (i < len) { lv += bb.getLong; i += 1 }
      h += 1
    }
    out
  }

  /** The flat eval encoding: `[n, numLevels, len_0, items_0 asc…, …]`
    * — per-level ascending so equal value MULTISETS serialize
    * identically in the exact regime (what lets the oracle and the
    * degenerate net hash it).
    */
  private[functions] def evalFlat(buf: Buf): GenericArrayData = {
    val items = buf.totalItems
    val out = new Array[Any](2 + buf.levels.length + items)
    out(0) = buf.n
    out(1) = buf.levels.length.toLong
    var idx = 2
    var h = 0
    while (h < buf.levels.length) {
      val sorted = buf.levels(h).toArray
      java.util.Arrays.sort(sorted)
      out(idx) = sorted.length.toLong; idx += 1
      var i = 0
      while (i < sorted.length) { out(idx) = sorted(i); idx += 1; i += 1 }
      h += 1
    }
    new GenericArrayData(out)
  }

  /** Rank-select from a flat sketch: the smallest item whose
    * cumulative weight reaches ceil(p·n) — `quantile_disc` exactly in
    * the unsaturated regime. Null on an empty sketch.
    */
  def quantileFromFlat(a: ArrayData, p: Double): Any = {
    val (items, weights, n) = decode(a)
    if (n == 0L || items.isEmpty) return null
    val target = math.max(1L, math.ceil(p * n.toDouble).toLong)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += weights(i)
      if (cum >= target) return items(i)
      i += 1
    }
    items(items.length - 1)
  }

  /** Estimated rank of `v`: total weight of sketch items ≤ v. Exact
    * in the unsaturated regime; within the KLL bound saturated.
    */
  def rankFromFlat(a: ArrayData, v: Long): Long = {
    val (items, weights, _) = decode(a)
    var cum = 0L
    var i = 0
    while (i < items.length && items(i) <= v) { cum += weights(i); i += 1 }
    cum
  }

  /** Decode a flat sketch into (items ascending, weights, n). */
  private def decode(a: ArrayData): (Array[Long], Array[Long], Long) = {
    if (a.numElements() < 2) return (Array.empty, Array.empty, 0L)
    val n = a.getLong(0)
    val nl = a.getLong(1).toInt
    var count = a.numElements() - 2 - nl
    if (count < 0) count = 0
    val items = new Array[Long](count)
    val weights = new Array[Long](count)
    var idx = 2
    var h = 0
    var j = 0
    while (h < nl) {
      val len = a.getLong(idx).toInt; idx += 1
      val w = 1L << h
      var i = 0
      while (i < len) {
        items(j) = a.getLong(idx + i); weights(j) = w; j += 1; i += 1
      }
      idx += len
      h += 1
    }
    // merge-sort by item (levels are each sorted; a full sort is fine
    // at summary grain — ≤ ~k items, once per GROUP, not per row)
    val ord = Array.range(0, j).sortBy(items(_))
    val si = new Array[Long](j)
    val sw = new Array[Long](j)
    var i = 0
    while (i < j) { si(i) = items(ord(i)); sw(i) = weights(ord(i)); i += 1 }
    (si, sw, n)
  }

  /** Column face: the mergeable sketch as array<bigint>. */
  def quantileSketch(c: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllSketchAggregate(GraftSqlBridge.expression(c), k)
        .toAggregateExpression())

  /** Column face: fold STORED sketch rows into one sketch. */
  def quantileMerge(sk: Column, k: Int): Column =
    GraftSqlBridge.column(
      KllMergeAggregate(GraftSqlBridge.expression(sk), k)
        .toAggregateExpression())

  /** Column face: rank-select a quantile from a stored sketch. */
  def quantileValue(sk: Column, p: Double): Column = {
    import org.apache.spark.sql.functions.lit
    GraftSqlBridge.column(KllValueExpression(
      GraftSqlBridge.expression(sk), GraftSqlBridge.expression(lit(p))))
  }

  /** Column face: estimated rank (weight ≤ v) from a stored sketch. */
  def quantileRank(sk: Column, v: Column): Column =
    GraftSqlBridge.column(KllRankExpression(
      GraftSqlBridge.expression(sk), GraftSqlBridge.expression(v)))
}

/** `graft_quantile_sketch(v, k)` — BIGINT values in, the flat
  * mergeable KLL summary out (class doc on [[Kll]]).
  */
case class KllSketchAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buf]
  with UnaryLike[Expression] {

  require(k >= 8, s"graft_quantile_sketch: k must be >= 8, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_sketch requires BIGINT, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_sketch"

  override def createAggregationBuffer(): Kll.Buf = new Kll.Buf(k)

  override def update(buf: Kll.Buf, input: InternalRow): Kll.Buf = {
    val v = child.eval(input)
    if (v != null) Kll.insert(buf, v.asInstanceOf[Long]) // nulls skipped
    buf
  }

  override def merge(b: Kll.Buf, o: Kll.Buf): Kll.Buf = Kll.mergeBufs(b, o)
  override def eval(buf: Kll.Buf): Any = Kll.evalFlat(buf)
  override def serialize(buf: Kll.Buf): Array[Byte] = Kll.ser(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Buf = Kll.de(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KllSketchAggregate = copy(child = newChild)
}

/** `graft_quantile_merge(sk, k)` — fold STORED flat sketches into one
  * (the serving fold of [[graft.sources.QuantileStore]] and the SQL
  * twin of re-aggregating the raw column; same bound as one sketch
  * over the concatenated stream).
  */
case class KllMergeAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buf]
  with UnaryLike[Expression] {

  require(k >= 8, s"graft_quantile_merge: k must be >= 8, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_merge requires ARRAY<BIGINT> (a stored " +
          s"sketch), got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_merge"

  override def createAggregationBuffer(): Kll.Buf = new Kll.Buf(k)

  override def update(buf: Kll.Buf, input: InternalRow): Kll.Buf = {
    val v = child.eval(input)
    if (v != null) Kll.ingestFlat(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b: Kll.Buf, o: Kll.Buf): Kll.Buf = Kll.mergeBufs(b, o)
  override def eval(buf: Kll.Buf): Any = Kll.evalFlat(buf)
  override def serialize(buf: Kll.Buf): Array[Byte] = Kll.ser(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Buf = Kll.de(bytes, k)

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): KllMergeAggregate = copy(child = newChild)
}

/** `graft_quantile_value(sk, p)` — rank-select the p-quantile from a
  * stored flat sketch: smallest item with cumulative weight ≥
  * ceil(p·n) (`quantile_disc` in the exact regime). Evaluated at
  * summary grain — one row per group, never the value grain.
  */
case class KllValueExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_value requires (ARRAY<BIGINT>, DOUBLE), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true // empty sketch -> null
  override def prettyName: String = "graft_quantile_value"

  override def nullSafeEval(sk: Any, p: Any): Any =
    Kll.quantileFromFlat(sk.asInstanceOf[ArrayData], p.asInstanceOf[Double])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // boxed call: the result may be null (empty sketch)
    nullSafeCodeGen(ctx, ev, (a, p) => {
      val v = ctx.freshName("qv")
      s"""Object $v = graft.functions.Kll.quantileFromFlat($a, $p);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ((Long) $v).longValue(); }""".stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllValueExpression =
    copy(left = newLeft, right = newRight)
}

/** `graft_quantile_rank(sk, v)` — total sketch weight of items ≤ v:
  * the (estimated) rank of `v`, exact unsaturated — the spec face for
  * the KLL error bound.
  */
case class KllRankExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_quantile_rank requires (ARRAY<BIGINT>, BIGINT), " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_quantile_rank"

  override def nullSafeEval(sk: Any, v: Any): Any =
    Kll.rankFromFlat(sk.asInstanceOf[ArrayData], v.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, v) =>
      s"graft.functions.Kll.rankFromFlat($a, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRankExpression =
    copy(left = newLeft, right = newRight)
}
