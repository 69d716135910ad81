package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Double Metaphone: one compiled call
  * per row returning `array(primary, secondary)` (secondary = "" when
  * identical to the primary — see [[DoubleMetaphone.encode]]). Both
  * codes come from a single pass, so the fpx feed pays one encode per
  * token instead of two.
  */
case class DoubleMetaphoneExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_double_metaphone requires STRING, got ${child.dataType.sql}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_double_metaphone"

  override def nullSafeEval(input: Any): Any =
    DoubleMetaphoneExpression.codes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DoubleMetaphoneExpression.codes($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DoubleMetaphoneExpression = copy(child = newChild)
}

object DoubleMetaphoneExpression {

  /** Column form — usable without any registration. */
  def doubleMetaphone(c: Column): Column =
    GraftSqlBridge.column(
      DoubleMetaphoneExpression(GraftSqlBridge.expression(c)))

  def codes(s: UTF8String): GenericArrayData = {
    val (p, sec) = DoubleMetaphone.encode(s.toString)
    new GenericArrayData(
      Array[Any](UTF8String.fromString(p), UTF8String.fromString(sec)))
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("graft_double_metaphone")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[DoubleMetaphoneExpression].getName, "graft_double_metaphone")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "graft_double_metaphone takes one argument")
    DoubleMetaphoneExpression(children.head)
  }

  /** Imperative registration for an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry
      .registerFunction(identifier, info, builder)
}
