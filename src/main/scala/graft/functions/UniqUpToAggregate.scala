package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_uniq_upto(value, n)` — the ClickHouse `uniqUpTo(N)` surface:
  * the EXACT distinct count while it is ≤ n, and n+1 (meaning
  * "more than n") past it. The answer a threshold screen actually
  * needs — "does this group exceed N distinct values" (the f8/d3
  * blocking-cutoff question, the HAVING-count-distinct gate) — without
  * q8's full distinct expansion: the buffer is a value SET CAPPED AT
  * n+1 entries, because once n+1 distinct values are witnessed the
  * answer is pinned and no further value can change it.
  *
  * Mergeable: union capped at n+1. If the group's true distinct count
  * is ≤ n, every partial holds a complete subset and the union is the
  * exact set; if it exceeds n, some chain of unions witnesses n+1
  * distinct values and caps — either way the result is exactly
  * `min(true_distinct, n+1)` at ANY parallelism (spec-asserted), with
  * ≤ n+1 values per (task, group) on the wire where exact
  * COUNT(DISTINCT) shuffles the full value grain. Values are kept
  * verbatim (BIGINT/INT or STRING) — no hashing, so there is no
  * collision regime: the ≤ n answer is exact, full stop.
  */
case class UniqUpToAggregate(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashSet[Any]]
  with UnaryLike[Expression] {

  require(n >= 1 && n <= (1 << 24),
    s"graft_uniq_upto: n must be in [1, 2^24], got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_uniq_upto requires BIGINT/INT/STRING, got ${other.sql}")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_uniq_upto"

  override def createAggregationBuffer(): mutable.HashSet[Any] =
    mutable.HashSet.empty

  private def add(buf: mutable.HashSet[Any], v: Any): Unit =
    if (buf.size <= n && !buf.contains(v)) { // capped at n+1 entries
      buf.add(v match {
        case s: UTF8String => s.clone() // may view a reused row buffer
        case other => other
      })
    }

  override def update(
      buf: mutable.HashSet[Any], input: InternalRow): mutable.HashSet[Any] = {
    val v = child.eval(input)
    if (v != null) add(buf, v) // nulls skipped, like count(DISTINCT col)
    buf
  }

  override def merge(
      b: mutable.HashSet[Any], o: mutable.HashSet[Any])
      : mutable.HashSet[Any] = {
    val it = o.iterator
    while (it.hasNext && b.size <= n) add(b, it.next())
    b
  }

  override def eval(buf: mutable.HashSet[Any]): Any = buf.size.toLong

  override def serialize(buf: mutable.HashSet[Any]): Array[Byte] =
    child.dataType match {
      case StringType =>
        var size = 4
        buf.foreach { v =>
          size += 4 + v.asInstanceOf[UTF8String].numBytes()
        }
        val bb = ByteBuffer.allocate(size)
        bb.putInt(buf.size)
        buf.foreach { v =>
          val bytes = v.asInstanceOf[UTF8String].getBytes
          bb.putInt(bytes.length)
          bb.put(bytes)
        }
        bb.array()
      case _ =>
        val bb = ByteBuffer.allocate(4 + 8 * buf.size)
        bb.putInt(buf.size)
        buf.foreach {
          case l: java.lang.Long => bb.putLong(l.longValue())
          case i: java.lang.Integer => bb.putLong(i.longValue())
        }
        bb.array()
    }

  override def deserialize(bytes: Array[Byte]): mutable.HashSet[Any] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val out = mutable.HashSet.empty[Any]
    var i = 0
    child.dataType match {
      case StringType =>
        while (i < sz) {
          val len = bb.getInt
          val vb = new Array[Byte](len)
          bb.get(vb)
          out.add(UTF8String.fromBytes(vb))
          i += 1
        }
      case IntegerType =>
        while (i < sz) { out.add(Int.box(bb.getLong.toInt)); i += 1 }
      case _ =>
        while (i < sz) { out.add(Long.box(bb.getLong)); i += 1 }
    }
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): UniqUpToAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UniqUpToAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): UniqUpToAggregate = copy(child = newChild)
}

object UniqUpToAggregate {
  /** Column form (aggregate function). */
  def uniqUpTo(c: Column, n: Int): Column =
    GraftSqlBridge.column(
      UniqUpToAggregate(GraftSqlBridge.expression(c), n)
        .toAggregateExpression())
}
