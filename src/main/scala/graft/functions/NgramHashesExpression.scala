package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed word n-grams: the DISTINCT space-joined n-grams of a
  * word array, each reduced to the 60-bit seeded md5 hash
  * (`Dedup.md5Hash60`, = `conv(substr(md5(seed || ':' || gram),1,15),
  * 16,10)`), in one compiled pass per row.
  *
  * Value-identical (same values, same first-occurrence order) to the
  * composed form `transform(Dedup.shinglesN(text, n),
  * g => Dedup.md5Hash60(lit(seed), g))`, which pays n−1 interpreted
  * `zip_with` walks to build the gram array, an `array_distinct` pass,
  * and a per-gram expression-tree md5 — higher-order functions never
  * enter whole-stage codegen. This is t5's hot path: decontamination
  * hashes every n-gram of every corpus document.
  *
  * PRECONDITION: array elements non-null (guaranteed by `Dedup.words`);
  * a null element is treated as "".
  */
case class NgramHashesExpression(child: Expression, n: Int, seed: Int)
    extends UnaryExpression {

  require(n >= 2, s"ngram width must be >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_hashes requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"

  override def nullSafeEval(input: Any): Any =
    NgramHashesExpression.hashes(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashesExpression.hashes($c, $n, $seed)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashesExpression =
    copy(child = newChild)
}

object NgramHashesExpression {

  /** Column form. */
  def ngramHashes(words: Column, n: Int, seed: Int): Column =
    GraftSqlBridge.column(
      NgramHashesExpression(GraftSqlBridge.expression(words), n, seed))

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = UTF8String.fromString("")

  /** Distinct space-joined n-grams in first-occurrence order — the
    * shared gram builder behind [[hashes]] and
    * [[ShinglesExpression]].
    */
  private[functions] def collectShingles(
      ws: ArrayData, n: Int): java.util.LinkedHashSet[UTF8String] = {
    val m = ws.numElements()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (m < n) return seen
    def word(i: Int): UTF8String = {
      val w = ws.getUTF8String(i)
      if (w == null) EMPTY else w
    }
    var i = 0
    while (i + n <= m) {
      var g = word(i)
      var k = 1
      while (k < n) { g = UTF8String.concat(g, SPACE, word(i + k)); k += 1 }
      seen.add(g)
      i += 1
    }
    seen
  }

  /** Distinct n-gram hashes in first-occurrence order; < n words →
    * empty. 60-bit value = high 60 bits of the md5 of "seed:gram"
    * (first 15 hex chars), built directly from the digest bytes.
    */
  def hashes(ws: ArrayData, n: Int, seed: Int): ArrayData = {
    val seen = collectShingles(ws, n)
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
    new GenericArrayData(out)
  }

  /** Column form of the POSITIONAL variant. */
  def ngramHashesAll(words: Column, n: Int, seed: Int): Column =
    GraftSqlBridge.column(
      NgramHashesAllExpression(GraftSqlBridge.expression(words), n, seed))

  /** One hash per gram POSITION (index i = the gram starting at word
    * i), no distinct — [[NgramHashesAllExpression]]'s kernel. < n
    * words → empty.
    */
  def hashesAll(ws: ArrayData, n: Int, seed: Int): ArrayData = {
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    def word(i: Int): UTF8String = {
      val w = ws.getUTF8String(i)
      if (w == null) EMPTY else w
    }
    val prefix = (java.lang.Integer.toString(seed) + ":")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val md = MessageDigest.getInstance("MD5")
    val d = new Array[Byte](16)
    val out = new Array[Long](m - n + 1)
    var i = 0
    while (i + n <= m) {
      var g = word(i)
      var k = 1
      while (k < n) { g = UTF8String.concat(g, SPACE, word(i + k)); k += 1 }
      md.reset()
      md.update(prefix)
      md.update(g.getBytes)
      md.digest(d, 0, 16)
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >> 4)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** The POSITIONAL sibling of [[NgramHashesExpression]]: one 60-bit
  * seeded-md5 hash per gram start position (array index = word
  * position, nothing deduplicated) — the form a substring-run
  * detector needs: d14 anchors runs at (doc, pos), so losing
  * positions (or collapsing repeats) would lose the run geometry.
  * Same digest kernel, one compiled pass per row.
  */
case class NgramHashesAllExpression(child: Expression, n: Int, seed: Int)
    extends UnaryExpression {

  require(n >= 2, s"ngram width must be >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_ngram_hashes_all requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes_all"

  override def nullSafeEval(input: Any): Any =
    NgramHashesExpression.hashesAll(input.asInstanceOf[ArrayData], n, seed)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramHashesExpression.hashesAll($c, $n, $seed)")

  override protected def withNewChildInternal(
      newChild: Expression): NgramHashesAllExpression =
    copy(child = newChild)
}
