package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}

/** Native word n-shingles: the DISTINCT space-joined n-grams of a word
  * array in first-occurrence order, one compiled pass per row —
  * value- and order-identical to `Dedup.shinglesN`'s composed form
  * (chained `zip_with` over shifted slices + `array_distinct`), which
  * runs n−1 interpreted array walks per row since higher-order
  * functions never enter whole-stage codegen. Feeds the MinHash scan
  * (d3) and the fingerprint min-shingle (t4); [[NgramHashesExpression]]
  * is the fused shingle+hash variant for consumers that only need the
  * 60-bit hashes (t5).
  *
  * PRECONDITION: array elements non-null (guaranteed by `Dedup.words`);
  * a null element is treated as "".
  */
case class ShinglesExpression(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 2, s"shingle width must be >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(input: Any): Any =
    ShinglesExpression.shingles(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShinglesExpression.shingles($c, $n)")

  override protected def withNewChildInternal(
      newChild: Expression): ShinglesExpression =
    copy(child = newChild)
}

object ShinglesExpression {

  /** Column form. */
  def shingles(words: Column, n: Int): Column =
    GraftSqlBridge.column(
      ShinglesExpression(GraftSqlBridge.expression(words), n))

  def shingles(ws: ArrayData, n: Int): ArrayData = {
    val seen = NgramHashesExpression.collectShingles(ws, n)
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
