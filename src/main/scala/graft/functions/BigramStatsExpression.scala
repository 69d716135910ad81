package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-2-gram repetition stats over a word array: ONE compiled
  * hash-count pass per row returning
  * `struct<n_grams, n_distinct, top_count>` — value-identical to the
  * composed form (`array_distinct` for n_distinct + `array_sort` +
  * `aggregate` fold for the max run) but without materializing the gram
  * array three times through interpreted higher-order functions (HOFs
  * never enter whole-stage codegen, and each pass re-walks every gram).
  * This is t7's hot path: the repetition quality signal a 100 TB
  * pipeline computes over every document.
  *
  * Semantics (matching the composed twin and the DuckDB oracle):
  * grams are adjacent word pairs joined by a single space; fewer than
  * two words → (0, 0, 0). Parity with the composed form is
  * spec-asserted on the real documents table.
  *
  * PRECONDITION: array elements non-null (guaranteed by `Dedup.words`,
  * which filters empties); a null element is treated as "".
  */
case class BigramStatsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_bigram_stats requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = BigramStatsExpression.schema
  override def prettyName: String = "graft_bigram_stats"

  override def nullSafeEval(input: Any): Any =
    BigramStatsExpression.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BigramStatsExpression.stats($c)")

  override protected def withNewChildInternal(
      newChild: Expression): BigramStatsExpression =
    copy(child = newChild)
}

object BigramStatsExpression {

  val schema: StructType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false)))

  /** Column form. */
  def bigramStats(words: Column): Column =
    GraftSqlBridge.column(
      BigramStatsExpression(GraftSqlBridge.expression(words)))

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY = UTF8String.fromString("")

  /** One pass: count each adjacent pair in a hash map; n_distinct is
    * the map size, top_count the max count seen (updated inline, no
    * second walk).
    */
  def stats(ws: ArrayData): InternalRow = {
    val n = ws.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    // capacity clamped BEFORE any doubling so a 2^30-element array
    // cannot overflow the computation into a negative capacity
    val counts = new java.util.HashMap[UTF8String, Array[Long]](
      Math.min(n, 1 << 20))
    def word(i: Int): UTF8String = {
      val w = ws.getUTF8String(i)
      if (w == null) EMPTY else w
    }
    var best = 0L
    var prev = word(0)
    var i = 1
    while (i < n) {
      val cur = word(i)
      val gram = UTF8String.concat(prev, SPACE, cur)
      var c = counts.get(gram)
      if (c == null) { c = Array(0L); counts.put(gram, c) }
      c(0) += 1L
      if (c(0) > best) best = c(0)
      prev = cur
      i += 1
    }
    new GenericInternalRow(
      Array[Any]((n - 1).toLong, counts.size.toLong, best))
  }
}
