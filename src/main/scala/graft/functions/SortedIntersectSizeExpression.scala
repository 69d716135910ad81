package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native intersection-size over two SORTED ascending `array<bigint>`
  * columns: a single linear merge per row — no hash set, no output-array
  * allocation (`size(array_intersect(a, b))` builds both). Used by the
  * Jaccard-verify stage of `Dedup.ngramJaccard`, where it runs once per
  * candidate pair.
  *
  * PRECONDITION: both inputs sorted ascending with distinct elements
  * (e.g. `array_sort` over hashes of an `array_distinct` token set).
  * Value-parity with `size(array_intersect(a, b))` under that
  * precondition is spec-asserted.
  */
case class SortedIntersectSizeExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size requires (ARRAY<BIGINT>, ARRAY<BIGINT>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectSizeExpression.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.SortedIntersectSizeExpression.count($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeExpression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSizeExpression {

  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectSizeExpression(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Linear merge count of common elements of two sorted long arrays. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}
