package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document DEFLATE statistics: ONE compiled pass returning
  * `struct<raw_bytes, deflate_bytes>` for a text column.
  *
  * The compression-ratio quality signal (CCNet / Gopher-era corpus
  * filtering): a document whose DEFLATE output is a tiny fraction of
  * its raw bytes is dominated by repeated boilerplate (crawler traps,
  * tag soup, keyword stuffing — LZ77 eats the repeats), while a ratio
  * near 1.0 means incompressible bytes (minified/binary/garbled text —
  * no natural-language structure for Huffman to exploit). Natural
  * prose sits in a stable mid band, so the ratio is a one-number gate
  * that catches BOTH failure modes where word-level heuristics (t2,
  * t13) see "many unique words". t7's repeated-LINE detector and t11's
  * passage miner find structured duplication; DEFLATE finds the
  * unstructured kind they cannot (sub-line repeats, interleaved
  * boilerplate).
  *
  * The kernel returns the two INTEGER byte counts, not the float ratio
  * — the division happens declaratively at the call site, keeping the
  * expression output exact and the gate arithmetic auditable. Uses
  * `java.util.zip.Deflater` (level 6, raw/nowrap — no zlib header
  * noise in the count) through a per-thread reusable instance: a
  * Deflater holds native zlib state, so allocating per row would
  * dominate the pass; `reset()` on a ThreadLocal instance is the
  * standard reuse pattern and safe under whole-stage codegen (one
  * task = one thread). DEFLATE output length is deterministic for a
  * fixed input, level, and strategy on a fixed zlib build — the spec
  * gates bit-for-bit against a fresh-Deflater recompute, and t16 is
  * declared rows-only at the driver (no SQL engine exposes deflate).
  */
case class DeflateStatsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_deflate_stats requires STRING, got ${other.sql}")
    }

  override def dataType: DataType = DeflateStatsExpression.schema
  override def prettyName: String = "graft_deflate_stats"

  override def nullSafeEval(input: Any): Any =
    DeflateStatsExpression.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateStatsExpression.stats($c)")

  override protected def withNewChildInternal(
      newChild: Expression): DeflateStatsExpression =
    copy(child = newChild)
}

object DeflateStatsExpression {

  val schema: StructType = StructType(Seq(
    StructField("raw_bytes", LongType, nullable = false),
    StructField("deflate_bytes", LongType, nullable = false)))

  /** Column form. */
  def deflateStats(text: Column): Column =
    GraftSqlBridge.column(
      DeflateStatsExpression(GraftSqlBridge.expression(text)))

  // one native zlib state per task thread, reset between rows
  private val deflaters: ThreadLocal[java.util.zip.Deflater] =
    ThreadLocal.withInitial(() =>
      new java.util.zip.Deflater(6, /* nowrap = */ true))

  /** The one-pass kernel (static so codegen calls it directly). */
  def stats(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    var compressed = 0L
    val buf = new Array[Byte](8192)
    while (!d.finished()) compressed += d.deflate(buf)
    new GenericInternalRow(Array[Any](bytes.length.toLong, compressed))
  }
}
