package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The xref match-candidate table — the reference's 14-column row
  * (engine.py:181-203): left/right (dataset, id, schema, country,
  * caption), judgement, score, ts, user, with `ReplacingMergeTree(ts)
  * ORDER BY (left_id, right_id)` upsert semantics (re-judging a pair
  * supersedes the old row) and a `_reverse` projection ordered
  * right-side-first (engine.py:259-261).
  *
  * Spark-first mapping: rows live in parquet; the MergeTree FINAL is
  * [[latestJudgements]] (one window / max_by per pair); the reverse
  * projection is a column-reordered view — at rest the analogue is a
  * second table sorted/bucketed by the right-side key, at query time
  * an equi-filter on `right_id` that the optimizer pushes to the scan.
  */
object Xref {

  val columns: Seq[String] = Seq(
    "left_dataset", "left_id", "left_schema", "left_country", "left_caption",
    "right_dataset", "right_id", "right_schema", "right_country",
    "right_caption", "judgement", "score", "ts", "user")

  /** Per-entity enrichment attributes for the xref row: dataset and
    * schema (unique per entity), the first country-prop value, and the
    * caption (first name-type value — the reference uses the entity's
    * caption, which nomenklatura derives from its name). One hash
    * aggregate with map-side combine; at 100 TB this is the same
    * shuffle shape as entity assembly (and shuffle-free on a store
    * bucketed by entity).
    */
  def entityAttrs(
      statements: DataFrame,
      countryProp: String = "country"): DataFrame =
    statements.groupBy(col("entity_id")).agg(
      min(col("dataset")).as("dataset"),
      min(col("schema")).as("schema"),
      min(when(col("prop") === countryProp, col("value"))).as("country"),
      min(when(col("prop_type") === "name", col("value"))).as("caption"))

  /** Blocking pairs → full xref candidate rows: enrich each side with
    * the entity attributes and attach (judgement, score, ts, user).
    * The two enrichment joins are equi-joins on the pair ids; the
    * attrs relation is |entities|-sized (≪ pairs), so AQE broadcasts
    * it when it fits.
    */
  def candidates(
      pairs: DataFrame,
      attrs: DataFrame,
      judgement: Column = lit("no_judgement"),
      score: Column = lit(0.0),
      ts: Column = lit(0L),
      user: Column = lit("graft")): DataFrame = {
    def side(prefix: String): DataFrame = attrs.select(
      col("entity_id").as(s"${prefix}_id"),
      col("dataset").as(s"${prefix}_dataset"),
      col("schema").as(s"${prefix}_schema"),
      col("country").as(s"${prefix}_country"),
      col("caption").as(s"${prefix}_caption"))
    pairs
      .join(side("left"), Seq("left_id"))
      .join(side("right"), Seq("right_id"))
      .withColumn("judgement", judgement)
      .withColumn("score", score)
      .withColumn("ts", ts)
      .withColumn("user", user)
      .select(columns.map(col): _*)
  }

  /** MergeTree FINAL over the pair key: the latest (by ts) row wins per
    * (left_id, right_id) — engine.py:199 `ReplacingMergeTree(ts)`.
    */
  def latestJudgements(xref: DataFrame): DataFrame =
    ReplacingMerge.latestByKey(
      xref,
      keys = Seq(col("left_id"), col("right_id")),
      version = Seq(col("ts")))

  /** Derive a resolver mapping (entity_id → canonical_id) from the
    * POSITIVE judgements of an xref table — the judgement→canonical
    * loop the reference closes through its external nomenklatura
    * `Resolver` (store.py:26-28; the `canonical_lookup` projection,
    * engine.py:259): entities connected by positive judgements form a
    * cluster, and every member resolves to the cluster's minimum id.
    *
    * Connected components via [[Components.minLabel]] (bounded
    * iterative min-propagation); every judged cluster member maps to
    * the cluster's minimum entity id.
    *
    * Feed it [[latestJudgements]] (or `XrefStore.readLatest`) so a
    * pair re-judged negative no longer links its endpoints.
    */
  def resolverMapping(judgements: DataFrame, maxIter: Int = 50): DataFrame =
    Components.minLabel(
      judgements.filter(col("judgement") === "positive")
        .select(col("left_id").as("src"), col("right_id").as("dst")),
      maxIter)
      .select(col("id").as("entity_id"), col("label").as("canonical_id"))

  /** The `_reverse` projection: same rows, right side leading — the
    * access path for "who matched against X" (engine.py:259-261).
    */
  def reverse(xref: DataFrame): DataFrame =
    xref.select(
      col("right_dataset"), col("right_id"), col("right_schema"),
      col("right_country"), col("right_caption"),
      col("left_dataset"), col("left_id"), col("left_schema"),
      col("left_country"), col("left_caption"),
      col("judgement"), col("score"), col("ts"), col("user"))

  /** Reverse lookup: all judgement rows whose RIGHT side is the given
    * entity (pushed-down equi-filter; on a right-bucketed reverse table
    * this is a single-bucket read).
    */
  def lookupByRight(xref: DataFrame, rightId: Column): DataFrame =
    reverse(xref).filter(col("right_id") === rightId)
}
