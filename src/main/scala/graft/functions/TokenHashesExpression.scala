package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sorted token-hash set: the 60-bit seeded md5 hashes
  * (`Dedup.md5Hash60`) of a word array's DISTINCT elements, sorted
  * ascending, in one compiled pass per row — value-identical to the
  * composed `array_sort(transform(array_distinct(ws), w =>
  * md5Hash60(seed, w)))`, which pays three interpreted array walks
  * (distinct, per-element expression-tree md5, sort). Distinctness is
  * on the WORD (two distinct words colliding to one hash keep both
  * copies), exactly like the composed form, so the array length IS the
  * distinct-token count.
  *
  * This is d2's hot scan: prefix-filtered Jaccard carries every
  * document's token set as these sorted hashes (the verify stage
  * merges them with [[SortedIntersectSizeExpression]]).
  *
  * PRECONDITION: array elements non-null (guaranteed by `Dedup.words`);
  * a null element is treated as "".
  */
case class TokenHashesExpression(child: Expression, seed: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_token_hashes requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(input: Any): Any =
    TokenHashesExpression.hashes(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TokenHashesExpression.hashes($c, $seed)")

  override protected def withNewChildInternal(
      newChild: Expression): TokenHashesExpression =
    copy(child = newChild)
}

object TokenHashesExpression {

  /** Column form. */
  def tokenHashes(words: Column, seed: Int): Column =
    GraftSqlBridge.column(
      TokenHashesExpression(GraftSqlBridge.expression(words), seed))

  private val EMPTY = UTF8String.fromString("")

  def hashes(ws: ArrayData, seed: Int): ArrayData = {
    val m = ws.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var i = 0
    while (i < m) {
      val w = ws.getUTF8String(i)
      seen.add(if (w == null) EMPTY else w)
      i += 1
    }
    val prefix = (java.lang.Integer.toString(seed) + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16) // reused digest buffer, no per-hash alloc
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      md.reset()
      md.update(prefix)
      md.update(it.next().getBytes)
      md.digest(d, 0, 16)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      out(j) = h
      j += 1
    }
    java.util.Arrays.sort(out)
    new GenericArrayData(out)
  }
}
