package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two numeric array columns (float or double
  * elements, independently per side), folding left-to-right in DOUBLE —
  * bitwise-identical to the declarative twin
  * `aggregate(zip_with(x, y, (p, q) => p.cast * q.cast), 0.0, _ + _)`
  * (same element order, same double adds), without materializing the
  * zipped product array per row. This is THE inner loop of every
  * similarity operator (d5 pair scoring, s1/s2/s3 query scoring, IVF
  * assignment scores |rows|·|centroids| pairs): per evaluation the
  * declarative form allocates and boxes a length-`dim` array, the
  * native form is a branchless primitive loop.
  *
  * PRECONDITION: equal-length arrays with no null elements (embedding
  * columns by construction). Parity with the declarative twin under
  * that precondition is spec-asserted on real data and randomized
  * vectors.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT|DOUBLE> on both sides, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"

  // lazy val, not def: interpreted-mode eval calls this per ROW of the
  // hottest inner loop — resolve the type dispatch once, not per call
  // (dataType is only safe to inspect after resolution, hence lazy)
  private lazy val method: String = {
    val lf = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val rf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    (lf, rf) match {
      case (true, true)   => "dotFF"
      case (true, false)  => "dotFD"
      case (false, true)  => "dotDF"
      case (false, false) => "dotDD"
    }
  }

  private lazy val evalFn: (ArrayData, ArrayData) => Double = method match {
    case "dotFF" => DotProductExpression.dotFF
    case "dotFD" => DotProductExpression.dotFD
    case "dotDF" => DotProductExpression.dotDF
    case "dotDD" => DotProductExpression.dotDD
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    evalFn(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DotProductExpression.$method($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {

  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProductExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
