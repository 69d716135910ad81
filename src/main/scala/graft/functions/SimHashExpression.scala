package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native SimHash: 60-bit near-dup signature of a distinct-token
  * array — value-identical to the `aggregate`/`zip_with` expression
  * form in Dedup.simhash (bit b set iff the ±1 votes of the tokens'
  * 60-bit md5 hashes sum ≥ 0), evaluated as one compiled call per row.
  */
case class SimHashExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash requires ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashExpression.signature(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SimHashExpression.signature($c)")

  override protected def withNewChildInternal(
      newChild: Expression): SimHashExpression = copy(child = newChild)
}

object SimHashExpression {

  def simhash(c: Column): Column =
    GraftSqlBridge.column(
      SimHashExpression(GraftSqlBridge.expression(c)))

  /** Votes over the tokens' md5Hash60(seed=0) values; bit b of the
    * result = (Σ ±1 by hash bit b) ≥ 0. Matches Dedup.simhash exactly.
    */
  def signature(tokens: ArrayData): Long = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    val n = tokens.numElements()
    var j = 0
    while (j < n) {
      md.reset()
      md.update('0'.toByte)
      md.update(':'.toByte)
      md.update(tokens.getUTF8String(j).getBytes)
      val d = md.digest()
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      var bit = 0
      while (bit < 60) {
        if (((h >> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      j += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) >= 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}
