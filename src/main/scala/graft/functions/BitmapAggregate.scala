package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Compressed EXACT id bitmaps (the Roaring design — Chambi, Lemire,
  * Kaser & Godin, "Better bitmap performance with Roaring bitmaps",
  * Software: Practice & Experience 2016; the ClickHouse
  * `groupBitmap`/`bitmapAndCardinality` surface): the id SET itself,
  * chunked by the high bits, each 2^16-id chunk stored either as a
  * sorted short array (sparse chunk) or a 1024-word bitset (dense
  * chunk). This is the EXACT sibling of the KMV sketch (q25/d15):
  * where KMV answers set cardinality/overlap within ±1/√k from k
  * longs, the bitmap answers them EXACTLY from O(|set|) bits — the
  * right tool below ~10^8 ids per group (user audiences, document
  * shards), where exactness is worth the linear payload.
  *
  * Guarantees:
  *   - the summary is a deterministic function of the value SET —
  *     update order, partitioning, and merge shape cannot move a bit
  *     (set union is idempotent/commutative/associative), so results
  *     hash-gate in EVERY regime, not just an exact window, and a
  *     store fold absorbs replayed batches structurally (the KMV
  *     replay immunity, NOT the MG/KLL version-accounting hazard);
  *   - every count/intersection/Jaccard over stored bitmaps is exact.
  *
  * Layout (flat `array<bigint>`, an opaque payload):
  * `[nChunks, then per chunk: key·2+kind, card, payload…]` — kind 0 =
  * sorted shorts packed 4/long (card ≤ 4096), kind 1 = 1024 bitset
  * words; chunks ascending by key. The AGGREGATION buffer keeps one
  * 8 KiB bitset per touched chunk (updates and merges are pure word
  * ops); the adaptive container choice happens at eval/serialize —
  * accepted trade: update-path memory is (touched chunks × 8 KiB), so
  * ids should be roughly dense per group (the classic Roaring array
  * container saves memory for scattered sparse chunks; here it saves
  * STORAGE, which is what the store fold and the shuffle carry).
  *
  * Values must be in [0, 2^47) (47 high bits of chunk key + kind bit
  * fit one header long); negatives are rejected loudly.
  *
  * Faces: [[BitmapAggregate]] (`graft_bitmap(v)`) builds the bitmap;
  * [[BitmapOrAggregate]] (`graft_bitmap_or(bm)`) folds STORED bitmaps
  * by union; [[BitmapCountExpression]] (`graft_bitmap_count`) and
  * [[BitmapAndCountExpression]] (`graft_bitmap_and_count`) answer
  * cardinality and intersection exactly at summary grain. Union
  * cardinality needs no kernel: |A|+|B|−|A∩B|.
  */
object Bitmap {

  private val ArrayCutoff = 4096 // roaring's container threshold
  private val MaxValue = (1L << 47) - 1L

  /** Aggregation state: chunk key → 1024-word bitset, ascending. */
  final class Buf extends Serializable {
    val chunks = new java.util.TreeMap[Long, Array[Long]]()
  }

  private[functions] def insert(buf: Buf, v: Long): Unit = {
    require(v >= 0L && v <= MaxValue,
      s"graft_bitmap: value out of [0, 2^47): $v")
    val words = buf.chunks.computeIfAbsent(v >>> 16, _ => new Array[Long](1024))
    val low = (v & 0xFFFFL).toInt
    words(low >>> 6) |= 1L << (low & 63)
  }

  private[functions] def mergeBufs(b: Buf, o: Buf): Buf = {
    val it = o.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = e.getValue
      b.chunks.get(e.getKey) match {
        case null => b.chunks.put(e.getKey, other.clone())
        case mine =>
          var i = 0
          while (i < 1024) { mine(i) |= other(i); i += 1 }
      }
    }
    b
  }

  private def chunkCard(words: Array[Long]): Int = {
    var c = 0; var i = 0
    while (i < 1024) { c += java.lang.Long.bitCount(words(i)); i += 1 }
    c
  }

  /** Flat encoding (class doc): adaptive container per chunk. */
  private[functions] def evalFlat(buf: Buf): GenericArrayData = {
    var total = 1
    val it0 = buf.chunks.entrySet().iterator()
    val cards = new java.util.ArrayList[Int]()
    while (it0.hasNext) {
      val c = chunkCard(it0.next().getValue)
      cards.add(c)
      total += 2 + (if (c <= ArrayCutoff) (c + 3) / 4 else 1024)
    }
    val out = new Array[Any](total)
    out(0) = buf.chunks.size.toLong
    var idx = 1
    var ci = 0
    val it = buf.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val card = cards.get(ci); ci += 1
      val words = e.getValue
      if (card <= ArrayCutoff) {
        out(idx) = e.getKey * 2L; out(idx + 1) = card.toLong; idx += 2
        var acc = 0L; var n = 0
        var w = 0
        while (w < 1024) {
          var bits = words(w)
          while (bits != 0L) {
            val low = (w << 6) + java.lang.Long.numberOfTrailingZeros(bits)
            bits &= bits - 1L
            acc |= low.toLong << ((n & 3) << 4)
            n += 1
            if ((n & 3) == 0) { out(idx) = acc; idx += 1; acc = 0L }
          }
          w += 1
        }
        if ((n & 3) != 0) { out(idx) = acc; idx += 1 }
      } else {
        out(idx) = e.getKey * 2L + 1L; out(idx + 1) = card.toLong; idx += 2
        var w = 0
        while (w < 1024) { out(idx) = words(w); idx += 1; w += 1 }
      }
    }
    new GenericArrayData(out)
  }

  /** Union a FLAT stored bitmap into a buffer — the
    * [[BitmapOrAggregate]] update step.
    */
  private[functions] def ingestFlat(buf: Buf, a: ArrayData): Unit = {
    if (a.numElements() < 1) return
    val nChunks = a.getLong(0).toInt
    var idx = 1
    var c = 0
    while (c < nChunks) {
      val header = a.getLong(idx)
      val card = a.getLong(idx + 1).toInt
      idx += 2
      val key = header >>> 1
      val kind = (header & 1L).toInt
      val words =
        buf.chunks.computeIfAbsent(key, _ => new Array[Long](1024))
      if (kind == 0) {
        var n = 0
        while (n < card) {
          val low =
            ((a.getLong(idx + (n >> 2)) >>> ((n & 3) << 4)) & 0xFFFFL).toInt
          words(low >>> 6) |= 1L << (low & 63)
          n += 1
        }
        idx += (card + 3) / 4
      } else {
        var w = 0
        while (w < 1024) { words(w) |= a.getLong(idx + w); w += 1 }
        idx += 1024
      }
      c += 1
    }
  }

  private[functions] def ser(buf: Buf): Array[Byte] = {
    val flat = evalFlat(buf)
    val bb = ByteBuffer.allocate(4 + 8 * flat.numElements())
    bb.putInt(flat.numElements())
    var i = 0
    while (i < flat.numElements()) { bb.putLong(flat.getLong(i)); i += 1 }
    bb.array()
  }

  private[functions] def de(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val arr = new Array[Any](n)
    var i = 0
    while (i < n) { arr(i) = bb.getLong; i += 1 }
    val buf = new Buf()
    ingestFlat(buf, new GenericArrayData(arr))
    buf
  }

  /** Exact cardinality from a flat bitmap: the header cards sum —
    * payloads are never touched.
    */
  def countFromFlat(a: ArrayData): Long = {
    if (a.numElements() < 1) return 0L
    val nChunks = a.getLong(0).toInt
    var idx = 1
    var c = 0
    var total = 0L
    while (c < nChunks) {
      val kind = (a.getLong(idx) & 1L).toInt
      val card = a.getLong(idx + 1)
      total += card
      idx += 2 + (if (kind == 0) ((card + 3) / 4).toInt else 1024)
      c += 1
    }
    total
  }

  /** Exact |A ∩ B| from two flat bitmaps: merge-walk the ascending
    * chunk directories, intersect matching chunks container-wise
    * (bitset×bitset = AND+popcount, shorts×shorts = two-pointer,
    * shorts×bitset = bit probes).
    */
  def andCountFromFlat(a: ArrayData, b: ArrayData): Long = {
    if (a.numElements() < 1 || b.numElements() < 1) return 0L
    var ia = 1; var ca = 0
    var ib = 1; var cb = 0
    val na = a.getLong(0).toInt
    val nb = b.getLong(0).toInt
    var total = 0L

    def skip(arr: ArrayData, idx: Int): Int = {
      val kind = (arr.getLong(idx) & 1L).toInt
      val card = arr.getLong(idx + 1)
      idx + 2 + (if (kind == 0) ((card + 3) / 4).toInt else 1024)
    }
    def shortAt(arr: ArrayData, base: Int, n: Int): Int =
      ((arr.getLong(base + (n >> 2)) >>> ((n & 3) << 4)) & 0xFFFFL).toInt

    while (ca < na && cb < nb) {
      val ha = a.getLong(ia); val hb = b.getLong(ib)
      val ka = ha >>> 1; val kb = hb >>> 1
      if (ka < kb) { ia = skip(a, ia); ca += 1 }
      else if (kb < ka) { ib = skip(b, ib); cb += 1 }
      else {
        val kindA = (ha & 1L).toInt; val kindB = (hb & 1L).toInt
        val cardA = a.getLong(ia + 1).toInt; val cardB = b.getLong(ib + 1).toInt
        (kindA, kindB) match {
          case (1, 1) =>
            var w = 0
            while (w < 1024) {
              total += java.lang.Long.bitCount(
                a.getLong(ia + 2 + w) & b.getLong(ib + 2 + w))
              w += 1
            }
          case (0, 0) =>
            var x = 0; var y = 0
            while (x < cardA && y < cardB) {
              val va = shortAt(a, ia + 2, x); val vb = shortAt(b, ib + 2, y)
              if (va < vb) x += 1
              else if (vb < va) y += 1
              else { total += 1; x += 1; y += 1 }
            }
          case (0, 1) =>
            var x = 0
            while (x < cardA) {
              val v = shortAt(a, ia + 2, x)
              if ((b.getLong(ib + 2 + (v >>> 6)) & (1L << (v & 63))) != 0L)
                total += 1
              x += 1
            }
          case _ =>
            var y = 0
            while (y < cardB) {
              val v = shortAt(b, ib + 2, y)
              if ((a.getLong(ia + 2 + (v >>> 6)) & (1L << (v & 63))) != 0L)
                total += 1
              y += 1
            }
        }
        ia = skip(a, ia); ca += 1
        ib = skip(b, ib); cb += 1
      }
    }
    total
  }

  /** Exact A ∖ B as a flat bitmap — the kernel behind the store's
    * USER-grain right-to-be-forgotten ([[graft.sources.BitmapStore]]):
    * a bitmap is the set itself, so deleting a member is a bit clear —
    * something no sketch summary (KMV/MG/KLL) can do exactly, because
    * their summaries cannot prove a member absent. Decodes both sides
    * into chunk bitsets, clears B's bits out of A, drops emptied
    * chunks.
    */
  def andNotFlat(a: ArrayData, b: ArrayData): GenericArrayData = {
    val ba = new Buf(); ingestFlat(ba, a)
    val bb = new Buf(); ingestFlat(bb, b)
    val it = bb.chunks.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val other = e.getValue
      ba.chunks.get(e.getKey) match {
        case null => ()
        case mine =>
          var i = 0
          var any = false
          while (i < 1024) {
            mine(i) &= ~other(i)
            any ||= mine(i) != 0L
            i += 1
          }
          if (!any) ba.chunks.remove(e.getKey)
      }
    }
    evalFlat(ba)
  }

  /** Column face: build the bitmap of a non-negative BIGINT column. */
  def bitmap(c: Column): Column =
    GraftSqlBridge.column(
      BitmapAggregate(GraftSqlBridge.expression(c)).toAggregateExpression())

  /** Column face: fold STORED bitmaps by union. */
  def bitmapOr(bm: Column): Column =
    GraftSqlBridge.column(
      BitmapOrAggregate(GraftSqlBridge.expression(bm))
        .toAggregateExpression())

  /** Column face: exact cardinality of a stored bitmap. */
  def bitmapCount(bm: Column): Column =
    GraftSqlBridge.column(
      BitmapCountExpression(GraftSqlBridge.expression(bm)))

  /** Column face: exact intersection cardinality of two bitmaps. */
  def bitmapAndCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndCountExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Column face: exact difference A ∖ B as a bitmap. */
  def bitmapAndNot(a: Column, b: Column): Column =
    GraftSqlBridge.column(BitmapAndNotExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}

/** `graft_bitmap(v)` — non-negative BIGINTs in, the flat chunked
  * bitmap out (class doc on [[Bitmap]]).
  */
case class BitmapAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Buf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap requires BIGINT, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap"

  override def createAggregationBuffer(): Bitmap.Buf = new Bitmap.Buf()

  override def update(buf: Bitmap.Buf, input: InternalRow): Bitmap.Buf = {
    val v = child.eval(input)
    if (v != null) Bitmap.insert(buf, v.asInstanceOf[Long]) // nulls skipped
    buf
  }

  override def merge(b: Bitmap.Buf, o: Bitmap.Buf): Bitmap.Buf =
    Bitmap.mergeBufs(b, o)
  override def eval(buf: Bitmap.Buf): Any = Bitmap.evalFlat(buf)
  override def serialize(buf: Bitmap.Buf): Array[Byte] = Bitmap.ser(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Buf = Bitmap.de(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapAggregate = copy(child = newChild)
}

/** `graft_bitmap_or(bm)` — union fold over STORED flat bitmaps (the
  * [[graft.sources.BitmapStore]] serving fold; set union absorbs
  * replayed rows structurally).
  */
case class BitmapOrAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Buf]
  with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_or requires ARRAY<BIGINT> (a stored bitmap), " +
          s"got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bitmap_or"

  override def createAggregationBuffer(): Bitmap.Buf = new Bitmap.Buf()

  override def update(buf: Bitmap.Buf, input: InternalRow): Bitmap.Buf = {
    val v = child.eval(input)
    if (v != null) Bitmap.ingestFlat(buf, v.asInstanceOf[ArrayData])
    buf
  }

  override def merge(b: Bitmap.Buf, o: Bitmap.Buf): Bitmap.Buf =
    Bitmap.mergeBufs(b, o)
  override def eval(buf: Bitmap.Buf): Any = Bitmap.evalFlat(buf)
  override def serialize(buf: Bitmap.Buf): Array[Byte] = Bitmap.ser(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Buf = Bitmap.de(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BitmapOrAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BitmapOrAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): BitmapOrAggregate = copy(child = newChild)
}

/** `graft_bitmap_count(bm)` — exact cardinality, from the chunk
  * headers alone.
  */
case class BitmapCountExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_count requires ARRAY<BIGINT>, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_count"

  override def nullSafeEval(bm: Any): Any =
    Bitmap.countFromFlat(bm.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Bitmap.countFromFlat($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BitmapCountExpression = copy(child = newChild)
}

/** `graft_bitmap_andnot(a, b)` — exact A ∖ B as a bitmap: the member
  * DELETE no sketch summary supports ([[Bitmap.andNotFlat]]).
  */
case class BitmapAndNotExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_andnot requires two ARRAY<BIGINT> bitmaps, " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bitmap_andnot"

  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmap.andNotFlat(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Bitmap.andNotFlat($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndNotExpression =
    copy(left = newLeft, right = newRight)
}

/** `graft_bitmap_and_count(a, b)` — exact |A ∩ B| at summary grain. */
case class BitmapAndCountExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bitmap_and_count requires two ARRAY<BIGINT> bitmaps, " +
          s"got (${l.sql}, ${r.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_and_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    Bitmap.andCountFromFlat(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Bitmap.andCountFromFlat($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCountExpression =
    copy(left = newLeft, right = newRight)
}
