package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native elementwise vector-sum aggregate: `vec_sum(array<double>)`
  * (float arrays are summed in double).
  *
  * The declarative way to average vectors per group is
  * posexplode → groupBy(key, pos) → avg → re-assemble, which shuffles
  * |rows|·dim rows to train centroids — 64× write amplification at the
  * testdata's embedding width, and the dominant cost of IVF coarse-
  * quantizer training over billions of vectors. This aggregate keeps
  * the sum as ONE double array per partial buffer with map-side
  * combine, so the shuffle carries one array per (task, group).
  *
  * Null inputs are skipped (like built-in sum); an empty group yields
  * null; mismatched dimensions fail loudly rather than mis-summing.
  * Addition order is partition-then-merge order, so last-bit float
  * results can differ from the posexplode form's — callers needing
  * cross-engine bit-parity (the s3 oracle twin) keep the declarative
  * form; the scale path tolerates 1e-9 relative drift (spec-bounded).
  */
case class VectorSumAggregate(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"vec_sum requires ARRAY<DOUBLE> or ARRAY<FLOAT>, got ${other.sql}")
    }

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_vec_sum"

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def add(buf: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    if (buf.isEmpty) {
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        i += 1
      }
      out
    } else {
      require(buf.length == n,
        s"vec_sum: dimension mismatch (${buf.length} vs $n)")
      var i = 0
      while (i < n) {
        buf(i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
        i += 1
      }
      buf
    }
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buf else add(buf, v.asInstanceOf[ArrayData])
  }

  override def merge(b: Array[Double], o: Array[Double]): Array[Double] =
    if (o.isEmpty) b
    else if (b.isEmpty) o
    else {
      require(b.length == o.length,
        s"vec_sum: dimension mismatch (${b.length} vs ${o.length})")
      var i = 0
      while (i < b.length) { b(i) += o(i); i += 1 }
      b
    }

  override def eval(buf: Array[Double]): Any =
    if (buf.isEmpty) null else new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bytes.length / 8)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): VectorSumAggregate =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): VectorSumAggregate =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(
      newChild: Expression): VectorSumAggregate = copy(child = newChild)
}

object VectorSumAggregate {
  /** Column form (aggregate function). */
  def vecSum(c: Column): Column =
    GraftSqlBridge.column(
      VectorSumAggregate(GraftSqlBridge.expression(c)).toAggregateExpression())
}
