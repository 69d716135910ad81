package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
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

  /** Validates the payload-shape preconditions shared by [[join]] and
    * [[joinBucketed]]: the left side must carry at least one payload
    * column (a zero-field `struct()` cannot be built — project a
    * dummy constant if you truly carry none), and no left column may
    * collide with a prefixed right output name.
    */
  private def requireShapes(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPrefix: String): (Array[String], Array[String]) = {
    val rPayload = right.columns.filterNot(c => c == key || c == ts)
    val lPayload = left.columns.filterNot(c => c == key || c == ts)
    require(lPayload.nonEmpty,
      s"asof join: left side needs at least one payload column beyond " +
        s"($key, $ts); project a constant if you carry none")
    val outRight = (ts +: rPayload).map(rightPrefix + _).toSet
    val collisions = left.columns.filter(outRight.contains)
    require(collisions.isEmpty,
      s"asof join: left columns ${collisions.mkString(", ")} collide with " +
        s"prefixed right output names; pick a different rightPrefix")
    (lPayload, rPayload)
  }

  /** `left`/`right`: any schema containing `key` and `ts` columns.
    * Output: every left column, plus each non-key right column renamed
    * with `rightPrefix` — only for left rows that have a match.
    */
  def join(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPrefix: String = "r_"): DataFrame = {
    val (lPayload, rPayload) =
      requireShapes(left, right, key, ts, rightPrefix)
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

  /** The skew-proof twin of [[join]] (the Skew.saltedJoin pattern
    * applied to as-of): [[join]] partitions the union by key alone, so
    * ONE hot key — a user with 10⁸ events — sorts its whole history in
    * a single task. This variant carries in TWO phases:
    *
    *   1. bucket both sides by `(key, floor(ts / bucketWidth))` and
    *      run the same union-and-carry INSIDE each bucket — the
    *      per-task sort is now bounded by a bucket, not a key;
    *   2. patch bucket boundaries: a left row whose bucket holds no
    *      earlier right row takes the latest right payload from any
    *      EARLIER bucket — computed from per-(key, bucket) last-right
    *      aggregates (bucket-grain, ≪ row-grain) with a running
    *      `last(ignoreNulls)` over buckets, joined back on
    *      (key, bucket).
    *
    * Value-parity with [[join]] is spec-asserted (hot-key synthetic +
    * the real events table). WHEN TO USE WHICH: [[join]] is one
    * shuffle + one window — cheaper, and right at any key whose
    * per-key row count fits a task (the common case). Reach for this
    * form when a key's history alone exceeds a task's memory/time
    * budget; `bucketWidth` should split the hottest key's span into
    * roughly `spark.sql.shuffle.partitions`-sized slices.
    *
    * `ts` must be castable to LONG (timestamp/date/numeric) for the
    * bucket floor; same right-side uniqueness precondition as [[join]].
    */
  def joinBucketed(
      left: DataFrame, right: DataFrame, key: String, ts: String,
      bucketWidth: Long, rightPrefix: String = "r_"): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val (lPayload, rPayload) =
      requireShapes(left, right, key, ts, rightPrefix)
    // exact floor division in LONG at any ts magnitude: integral DIV
    // truncates toward zero, so floor = quotient − 1 exactly when the
    // remainder is negative. Spark's `/` is double division — beyond
    // 2^53 (nanosecond-epoch longs) adjacent buckets would silently
    // merge. (The tempting `(t − pmod(t,w)) div w` form underflows
    // LONG for t near Long.MinValue — an "unknown time" sentinel —
    // and ANSI mode turns that into a runtime throw; here every
    // intermediate fits: |q0·w| ≤ max(|t|, 2^63) stays representable
    // and |r| < w.)
    def bucketOf(c: Column): Column = {
      val t = c.cast("long")
      val q0 = GraftSqlBridge.column(new IntegralDivide(
        GraftSqlBridge.expression(t),
        GraftSqlBridge.expression(lit(bucketWidth))))
      val r = t - q0 * lit(bucketWidth)
      q0 - when(r < 0, lit(1L)).otherwise(lit(0L))
    }

    val rStruct = struct((col(ts) +: rPayload.map(col)): _*)
    val rTagged = right.select(col(key), col(ts),
      bucketOf(col(ts)).as("__bucket"), lit(0).as("__side"),
      rStruct.as("__rv"))
    val lTagged = left.select(col(key), col(ts),
      bucketOf(col(ts)).as("__bucket"), lit(1).as("__side"),
      lit(null).cast(rTagged.schema("__rv").dataType).as("__rv"),
      struct(lPayload.map(col): _*).as("__lv"))
    val unioned = rTagged
      .withColumn("__lv", lit(null).cast(lTagged.schema("__lv").dataType))
      .unionByName(lTagged)

    // phase 1: carry INSIDE (key, bucket) — the per-task unit is a
    // bucket, so a hot key spreads over its ts range
    val wInBucket = Window.partitionBy(col(key), col("__bucket"))
      .orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__asof", last(col("__rv"), ignoreNulls = true).over(wInBucket))
      .filter(col("__side") === 1)

    // phase 2: per-(key, bucket) last right payload (max ts wins; the
    // uniqueness precondition makes ties impossible), carried across
    // buckets with a window over BUCKET-grain rows — each key
    // contributes one row per occupied bucket, not one per event
    val wAcross = Window.partitionBy(col(key)).orderBy(col("__bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastPerBucket = rTagged
      .groupBy(col(key), col("__bucket"))
      .agg(max_by(col("__rv"), col(ts)).as("__last_rv"))
    // every bucket a LEFT row occupies must appear, or the across-
    // bucket carry never reaches it: union right-occupied buckets with
    // left-occupied ones (null __last_rv) before the running carry.
    // Derived from lTagged, NOT from `carried`: the set of (key,
    // bucket) pairs is identical, but carried would embed the whole
    // phase-1 union+window subtree a second time in the plan
    val occupied = lastPerBucket
      .unionByName(
        lTagged.select(col(key), col("__bucket")).distinct()
          .withColumn("__last_rv",
            lit(null).cast(rTagged.schema("__rv").dataType)))
      .groupBy(col(key), col("__bucket"))
      .agg(max_by(col("__last_rv"), col("__last_rv").isNotNull.cast("int"))
        .as("__last_rv"))
    val carryIn = occupied
      .withColumn("__carry_in",
        last(col("__last_rv"), ignoreNulls = true).over(wAcross))
      .select(col(key), col("__bucket"), col("__carry_in"))

    // null-SAFE patch join (<=>): the plain form's window partitioning
    // groups null keys into one partition and matches inside it, so the
    // boundary patch must reach null-key rows too — a plain equi-join
    // would drop them and break the spec-asserted value parity with
    // [[join]] on null key/ts inputs. (Null ts rows land in the null
    // bucket, which sorts FIRST across buckets — the same "nulls first"
    // position they take in the plain form's per-key sort.)
    val patched = carried
      .join(carryIn
          .withColumnRenamed(key, "__ci_key")
          .withColumnRenamed("__bucket", "__ci_bucket"),
        col(key) <=> col("__ci_key") && col("__bucket") <=> col("__ci_bucket"),
        "left")
      .withColumn("__asof", coalesce(col("__asof"), col("__carry_in")))
      .filter(col("__asof").isNotNull)
    val outCols =
      col(key) +: col(ts) +:
        (lPayload.map(c => col(s"__lv.$c").as(c)) :+
          col(s"__asof.$ts").as(rightPrefix + ts)) ++:
        rPayload.map(c => col(s"__asof.$c").as(rightPrefix + c))
    patched.select(outCols: _*)
  }
}
