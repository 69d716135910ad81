package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-document word statistics over a word array: ONE compiled
  * pass returning `struct<en_hits, de_hits, es_hits, fr_hits,
  * stop_hits, char_sum, n_words>` — the counters langId (t1), quality
  * scoring (t2), the Gopher gate (t13/p3) and the composed preprocess
  * (p1/st11) all consume. The composed form costs SIX interpreted
  * array walks per row (four per-language `filter`+`isin` passes, one
  * all-languages pass, one `aggregate` length fold — HOFs never enter
  * whole-stage codegen and `isin` compares every word against every
  * list literal); here each word is ONE hash lookup against a
  * per-language bitmask map, and the whole struct computes in a single
  * traversal.
  *
  * Semantics match the composed twins exactly (spec-asserted on real
  * documents and random unicode text): `xx_hits` counts words (with
  * multiplicity) contained in language xx's list; `stop_hits` counts
  * words contained in ANY list (the distinct-union semantics of
  * `hits(ws, stopwords.flatMap(_._2).distinct)`); `char_sum` is the
  * sum of `length(w)` in characters; `n_words` is the array size.
  * Null elements count as "" (cannot arise from `Dedup.words`).
  */
case class WordStatsExpression(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_word_stats requires ARRAY<STRING>, got ${other.sql}")
    }

  override def dataType: DataType = WordStatsExpression.schema
  override def prettyName: String = "graft_word_stats"

  override def nullSafeEval(input: Any): Any =
    WordStatsExpression.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordStatsExpression.stats($c)")

  override protected def withNewChildInternal(
      newChild: Expression): WordStatsExpression =
    copy(child = newChild)
}

object WordStatsExpression {

  /** THE per-language stopword lists (function words only) — the
    * single definition; `TextAnalysis.stopwords` re-exports it so the
    * native map and every composed twin share one source of truth.
    */
  val languages: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "von"),
    "es" -> Seq("el", "los", "las", "es", "y", "que", "un", "una"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "des", "du"))

  val schema: StructType = StructType(
    languages.map { case (l, _) =>
      StructField(s"${l}_hits", LongType, nullable = false) } ++ Seq(
      StructField("stop_hits", LongType, nullable = false),
      StructField("char_sum", LongType, nullable = false),
      StructField("n_words", LongType, nullable = false)))

  /** Column form. */
  def wordStats(words: Column): Column =
    GraftSqlBridge.column(
      WordStatsExpression(GraftSqlBridge.expression(words)))

  // word → bitmask (bit i set ⇔ the word is in languages(i)'s list);
  // built once, read-only thereafter (safe under concurrent tasks)
  private val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    languages.zipWithIndex.foreach { case ((_, list), i) =>
      list.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, Integer.valueOf(
          (if (prev == null) 0 else prev.intValue()) | (1 << i)))
      }
    }
    m
  }

  /** The one-pass kernel (static so codegen calls it directly). */
  def stats(ws: ArrayData): GenericInternalRow = {
    val counts = new Array[Long](languages.size)
    var all = 0L
    var charSum = 0L
    val n = ws.numElements()
    var i = 0
    while (i < n) {
      val w = ws.getUTF8String(i)
      if (w != null) {
        charSum += w.numChars()
        val m = masks.get(w)
        if (m != null) {
          all += 1
          var mm = m.intValue()
          while (mm != 0) {
            val b = java.lang.Integer.numberOfTrailingZeros(mm)
            counts(b) += 1
            mm &= mm - 1
          }
        }
      }
      i += 1
    }
    // one allocation on the per-document hot path
    val out = new Array[Any](counts.length + 3)
    var j = 0
    while (j < counts.length) { out(j) = counts(j); j += 1 }
    out(counts.length) = all
    out(counts.length + 1) = charSum
    out(counts.length + 2) = n.toLong
    new GenericInternalRow(out)
  }
}
