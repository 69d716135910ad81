package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native MinHash signature: for seed i in [0, numHashes), the minimum
  * over the input string array of the 60-bit md5-derived hash of
  * "i:element" — value-identical to the `aggregate`/`zip_with`
  * expression form (and therefore to the DuckDB oracle), but evaluated
  * as ONE compiled call per row with a reused MessageDigest instead of
  * an interpreted lambda tree doing per-element reflective evaluation.
  * The hot scan of LSH dedup at 100 TB runs here.
  */
case class MinHashSignatureExpression(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash requires ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.signature(
      input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.MinHashSignatureExpression.signature" +
        s"($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignatureExpression =
    copy(child = newChild)
}

/** Fused shingle-build + MinHash: computes the signature straight off
  * the WORD array — the distinct space-joined n-grams never
  * materialize as a per-row array (the two-step form allocates and
  * copies a GenericArrayData per document between the shingle
  * expression and the signature expression). Value-identical to
  * `MinHashSignatureExpression(ShinglesExpression(ws, n), numHashes)`;
  * parity is spec-asserted. d3's scan runs here.
  */
case class MinHashWordsExpression(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  require(n >= 2, s"shingle width must be >= 2, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_words requires ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_words"

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.signatureOfNgrams(
      input.asInstanceOf[ArrayData], n, numHashes)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.MinHashSignatureExpression.signatureOfNgrams" +
        s"($c, $n, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashWordsExpression =
    copy(child = newChild)
}

/** The whole d3 scan kernel in one compiled call: words → distinct
  * n-shingles → per-seed minima → LSH band keys. Neither the shingle
  * array, the signature array, nor any intermediate struct array ever
  * materializes into row storage — the pre-r8 band projection still
  * ran an interpreted `transform(sequence, b -> struct(b,
  * concat_ws("-", slice(sig, …))))` per row on top of the signature.
  * Output: `numHashes / rowsPerBand` strings, band b's key the
  * '-'-joined decimal minima of its signature slice — value-identical
  * to the composed form (and the DuckDB oracle's string_agg);
  * parity is spec-asserted. Band index = array position (posexplode).
  */
case class MinHashBandsExpression(
    child: Expression, n: Int, numHashes: Int, rowsPerBand: Int)
    extends UnaryExpression {

  require(n >= 2, s"shingle width must be >= 2, got $n")
  require(rowsPerBand > 0 && numHashes % rowsPerBand == 0,
    s"rowsPerBand $rowsPerBand must divide numHashes $numHashes")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands requires ARRAY<STRING>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def nullSafeEval(input: Any): Any =
    MinHashSignatureExpression.bandKeysOfNgrams(
      input.asInstanceOf[ArrayData], n, numHashes, rowsPerBand)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "graft.functions.MinHashSignatureExpression.bandKeysOfNgrams" +
        s"($c, $n, $numHashes, $rowsPerBand)")

  override protected def withNewChildInternal(
      newChild: Expression): MinHashBandsExpression =
    copy(child = newChild)
}

object MinHashSignatureExpression {

  /** Column form. */
  def minhash(c: Column, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashSignatureExpression(GraftSqlBridge.expression(c), numHashes))

  /** Column form of the fused words→shingles→signature expression. */
  def minhashWords(words: Column, n: Int, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashWordsExpression(
      GraftSqlBridge.expression(words), n, numHashes))

  /** Column form of the fused words→…→band-keys expression. */
  def minhashBands(
      words: Column, n: Int, numHashes: Int, rowsPerBand: Int): Column =
    GraftSqlBridge.column(MinHashBandsExpression(
      GraftSqlBridge.expression(words), n, numHashes, rowsPerBand))

  /** [[signatureOfNgrams]] carried one step further: the signature
    * never escapes the local `mins` buffer — band keys come straight
    * off it.
    */
  def bandKeysOfNgrams(
      ws: ArrayData, n: Int, numHashes: Int, rowsPerBand: Int): ArrayData = {
    val mins = signatureOfNgrams(ws, n, numHashes)
      .asInstanceOf[GenericArrayData]
    val numBands = numHashes / rowsPerBand
    val out = new Array[Any](numBands)
    val sb = new java.lang.StringBuilder(rowsPerBand * 20)
    var b = 0
    while (b < numBands) {
      sb.setLength(0)
      var i = 0
      while (i < rowsPerBand) {
        if (i > 0) sb.append('-')
        sb.append(mins.getLong(b * rowsPerBand + i))
        i += 1
      }
      out(b) = org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** [[signature]] over the distinct n-grams of a word array, without
    * materializing the gram array into row storage.
    */
  def signatureOfNgrams(ws: ArrayData, n: Int, numHashes: Int): ArrayData = {
    val seen = NgramHashesExpression.collectShingles(ws, n)
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val prefixes = Array.tabulate(numHashes)(i =>
      (java.lang.Integer.toString(i) + ":")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = new Array[Byte](16)
    val it = seen.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(bytes)
        md.digest(d, 0, 16)
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >> 4)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Compute all seed-minima in one pass; value-identical to
    * conv(substr(md5(seed:element),1,15),16,10) per (seed, element).
    */
  def signature(elements: ArrayData, numHashes: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(numHashes)(Long.MaxValue)
    // seed prefixes ("0:", "1:", …) and the digest output buffer are
    // hoisted: the inner loop runs numHashes × |shingles| times per row
    // and a fresh 16-byte digest allocation per hash is pure GC churn
    val prefixes = Array.tabulate(numHashes)(i =>
      (java.lang.Integer.toString(i) + ":")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = new Array[Byte](16)
    val n = elements.numElements()
    var j = 0
    while (j < n) {
      val bytes = elements.getUTF8String(j).getBytes
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(prefixes(i))
        md.update(bytes)
        md.digest(d, 0, 16)
        // first 15 hex chars = high 60 bits of the first 8 digest bytes
        // (7.5 bytes); build the value directly instead of via strings
        var h = 0L
        var b = 0
        while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
        h = (h << 4) | ((d(7) & 0xf0L) >> 4)
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }
}
