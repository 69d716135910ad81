package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: for every left row, the single right row with
  * the greatest timestamp ≤ the left row's timestamp within the same
  * key — "the state as of that moment". The classic uses: trade→quote
  * matching, attribution (purchase→latest preceding click), slowly-
  * changing-dimension lookups. Spark has no native as-of operator;
  * DuckDB's `ASOF JOIN` (the q20 oracle) is the reference semantic:
  * inclusive (`l.ts >= r.ts`), inner (unmatched left rows drop).
  *
  * NOT a range join: the naive formulation
  * `l JOIN r ON l.key = r.key AND r.ts <= l.ts` + max-per-left expands
  * |left|·|right-per-key| intermediate rows — quadratic per key, the
  * same trap as unblocked dedup. This implementation is the
  * union-and-carry form: tag both sides, sort each key's rows by
  * (ts, side) ONCE, and carry the latest right payload forward with a
  * running `last(ignoreNulls)` window. Cost is one shuffle on the key
  * and a per-key sort — the sort-merge as-of, linear in rows at any
  * scale. Right rows sort BEFORE left rows at equal ts (side 0 < 1),
  * which is exactly the inclusive `>=` bound.
  *
  * PRECONDITION: `right` has at most one row per (key, ts) — otherwise
  * "the" as-of row is ill-defined (DuckDB picks one arbitrarily; this
  * operator picks the last in sort order). Callers dedup first, e.g.
  * one row per (user, ts) by max event id.
  */
object AsofJoin {

  /** `left`/`right`: any schema containing `key` and `ts` columns.
    * Output: every left column, plus each non-key right column renamed
    * with `rightPrefix` — only for left rows that have a match.
    */
  def join(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPrefix: String = "r_"): DataFrame = {
    val rPayload = right.columns.filterNot(c => c == key || c == ts)
    val lPayload = left.columns.filterNot(c => c == key || c == ts)
    // one struct per side so the union schema is stable regardless of
    // payload width; right also carries its ts into the payload (the
    // matched "as-of" timestamp is part of the answer)
    val rStruct = struct((col(ts) +: rPayload.map(col)): _*)
    val rTagged = right.select(col(key), col(ts),
      lit(0).as("__side"), rStruct.as("__rv"))
    val lTagged = left.select(col(key), col(ts),
      lit(1).as("__side"), lit(null).cast(rTagged.schema("__rv").dataType)
        .as("__rv"), struct(lPayload.map(col): _*).as("__lv"))
    val unioned = rTagged
      .withColumn("__lv", lit(null).cast(lTagged.schema("__lv").dataType))
      .unionByName(lTagged)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1 && col("__asof").isNotNull)
    val outCols =
      col(key) +: col(ts) +:
        (lPayload.map(c => col(s"__lv.$c").as(c)) :+
          col(s"__asof.$ts").as(rightPrefix + ts)) ++:
        rPayload.map(c => col(s"__asof.$c").as(rightPrefix + c))
    carried.select(outCols: _*)
  }
}
