package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native name fingerprint (`fingerprints.generate` contract,
  * reference phonetic.py:43-45): lowercase, non-[a-z0-9] → separator,
  * distinct tokens, sort, join by one space — ONE compiled pass per
  * row, value-identical to the composed
  * `array_join(array_sort(array_distinct(filter(split(regexp_replace(
  * lower(c), "[^a-z0-9]+", " "), " "), ...))))`, which pays four
  * interpreted array walks per value. This is the fpx feed's hot scan
  * (f5/f6/f8/f17): every name statement is fingerprinted on write.
  *
  * Token scan exactness: after unicode lowercasing, the kept alphabet
  * [a-z0-9] is single-byte UTF-8 and every other byte (including each
  * byte of a multi-byte sequence) is a separator — byte-wise scanning
  * therefore splits exactly where the regex does, and the surviving
  * tokens are pure ASCII, so UTF8String binary ordering equals the
  * composed form's sort order.
  */
case class FingerprintExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_fingerprint requires STRING, got ${other.sql}")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fingerprint"

  override def nullSafeEval(input: Any): Any =
    FingerprintExpression.fingerprint(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FingerprintExpression.fingerprint($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FingerprintExpression =
    copy(child = newChild)
}

object FingerprintExpression {

  /** Column form. */
  def fingerprint(c: Column): Column =
    GraftSqlBridge.column(
      FingerprintExpression(GraftSqlBridge.expression(c)))

  private def isKept(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** Distinct sorted normalized tokens joined by a single space. */
  def fingerprint(s: UTF8String): UTF8String = {
    val bytes = s.toLowerCase.getBytes
    val seen = new java.util.TreeSet[UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      while (i < n && !isKept(bytes(i))) i += 1
      val start = i
      while (i < n && isKept(bytes(i))) i += 1
      if (i > start)
        seen.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
    }
    if (seen.isEmpty) return UTF8String.fromString("")
    val parts = new Array[UTF8String](seen.size() * 2 - 1)
    val space = UTF8String.fromString(" ")
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      if (j > 0) { parts(j) = space; j += 1 }
      parts(j) = it.next(); j += 1
    }
    UTF8String.concat(parts: _*)
  }
}

/** Native blocking-token set of a fingerprint (reference
  * phonetic.py:32-37 `tokenize`): the full fingerprint plus each
  * token longer than 5 chars — value- and order-identical to the
  * composed `array_union(array(fp), filter(split(fp, " "), ...))`
  * (the full string first, then qualifying tokens in order, deduped).
  */
case class FpxTokensExpression(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_fpx_tokens requires STRING, got ${other.sql}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_fpx_tokens"

  override def nullSafeEval(input: Any): Any =
    FpxTokensExpression.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FpxTokensExpression.tokens($c)")

  override protected def withNewChildInternal(
      newChild: Expression): FpxTokensExpression =
    copy(child = newChild)
}

object FpxTokensExpression {

  /** Column form. */
  def fpxTokens(fp: Column): Column =
    GraftSqlBridge.column(
      FpxTokensExpression(GraftSqlBridge.expression(fp)))

  def tokens(fp: UTF8String): ArrayData = {
    val seen = new java.util.LinkedHashSet[UTF8String]()
    seen.add(fp)
    val bytes = fp.getBytes
    val n = bytes.length
    var i = 0
    while (i < n) {
      while (i < n && bytes(i) == ' ') i += 1
      val start = i
      while (i < n && bytes(i) != ' ') i += 1
      if (i > start) {
        val tok = UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i))
        // CHARACTER length, like the composed `length(t) > 5`: the
        // registered SQL function accepts arbitrary strings, where
        // byte length diverges on multi-byte tokens
        if (tok.numChars() > 5) seen.add(tok)
      }
    }
    val out = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
