package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Native membership test of a BIGINT in a SORTED ascending
  * `array<bigint>`: one binary search per call — `array_contains`
  * scans linearly, which turns a bounded 10k-entry probe array into
  * ~10⁴ comparisons per element when used inside a higher-order
  * filter (the d11 scrub probes every shingle of every document).
  *
  * PRECONDITION: the array is sorted ascending (duplicates allowed).
  * Null elements — which Spark's `array_sort` places LAST — are
  * skipped, and a miss returns plain false rather than SQL
  * `array_contains`'s three-valued NULL; value-parity with
  * `array_contains` on null-free sorted arrays is spec-asserted.
  */
case class SortedContainsExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_contains requires (BIGINT, ARRAY<BIGINT>), " +
          s"got (${l.sql}, ${r.sql})")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_sorted_contains"

  override def nullSafeEval(v: Any, arr: Any): Any =
    SortedContainsExpression.contains(
      v.asInstanceOf[Long], arr.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, a) =>
      s"graft.functions.SortedContainsExpression.contains($v, $a)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedContainsExpression =
    copy(left = newLeft, right = newRight)
}

object SortedContainsExpression {

  def sortedContains(v: Column, sorted: Column): Column =
    GraftSqlBridge.column(SortedContainsExpression(
      GraftSqlBridge.expression(v), GraftSqlBridge.expression(sorted)))

  /** Binary search membership in a sorted ascending long array.
    * `array_sort` puts null elements last — skip them, or getLong
    * would read garbage and poison the search.
    */
  def contains(v: Long, a: ArrayData): Boolean = {
    var lo = 0
    var hi = a.numElements() - 1
    while (hi >= 0 && a.isNullAt(hi)) hi -= 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val x = a.getLong(mid)
      if (x < v) lo = mid + 1
      else if (x > v) hi = mid - 1
      else return true
    }
    false
  }
}
