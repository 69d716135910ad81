package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The FTM statement data model.
  *
  * The reference decomposes every entity into statement rows — one row
  * per (entity, property, value) assertion — stored in the ClickHouse
  * table defined at /root/reference/ftm_columnstore/engine.py:130-160.
  * On Spark, `Dataset[Statement]` over partitioned parquet is the
  * equivalent canonical representation.
  */
final case class Statement(
    id: String,
    entity_id: String,
    canonical_id: String,
    prop: String,
    prop_type: String,
    schema: String,
    value: String,
    original_value: Option[String],
    dataset: String,
    lang: Option[String],
    target: Boolean,
    external: Boolean,
    first_seen: Option[java.sql.Timestamp],
    last_seen: java.sql.Timestamp)

object Statements {

  /** One property column of a wide entity table, with its FTM prop
    * name and type registry name.
    */
  final case class PropSpec(prop: String, propType: String, col: Column)

  /** Decompose a wide entity DataFrame into statement rows (the write
    * path: nomenklatura `Statement.from_entity`, applied by
    * `ClickhouseWriter._upsert_batch` at store.py:54-60).
    *
    * Emits the slim analytical columns; `canonical_id` starts equal to
    * `entity_id` (resolution happens later — see `Fpx.canonicalize`).
    * The unpivot is a per-row explode: narrow, shuffle-free, and fully
    * codegen'd — it scales linearly to any table size.
    */
  def unpivot(
      df: DataFrame,
      entityId: Column,
      schema: String,
      dataset: String,
      props: Seq[PropSpec]): DataFrame = {
    val stmts = array(props.map { p =>
      struct(
        p.col.cast("string").as("value"),
        lit(p.prop).as("prop"),
        lit(p.propType).as("prop_type"))
    }: _*)
    df.select(entityId.cast("string").as("entity_id"), explode(stmts).as("s"))
      .select(
        col("entity_id"),
        col("entity_id").as("canonical_id"),
        lit(schema).as("schema"),
        lit(dataset).as("dataset"),
        col("s.prop").as("prop"),
        col("s.prop_type").as("prop_type"),
        col("s.value").as("value"))
      .filter(col("value").isNotNull)
  }

  /** Re-assemble entities from statements (the read path:
    * `view.get_entity` / `_iterate_stmts` at store.py:40-45).
    *
    * Properties are folded into a deterministic sorted
    * `prop=value|prop=value` string per entity — a hash-stable stand-in
    * for the prop→values map, portable across engines. Grouping key is
    * `canonical_id`: statements of merged entities collapse into one
    * entity, exactly like the reference's canonical view.
    */
  def assemble(statements: DataFrame): DataFrame =
    statements
      .groupBy(col("canonical_id"), col("schema"), col("dataset"))
      .agg(
        array_join(
          array_sort(collect_list(concat_ws("=", col("prop"), col("value")))),
          "|").as("entity"),
        count(lit(1)).as("n_statements"))

  /** Entity assembly returning the prop→sorted-values MAP (the API
    * shape of `view.get_entity`); [[assemble]] is its hash-stable
    * string twin for oracle gating.
    */
  def assembleMap(statements: DataFrame): DataFrame =
    statements
      .groupBy(col("canonical_id"), col("schema"), col("dataset"))
      .agg(
        array_sort(collect_list(struct(col("prop"), col("value"))))
          .as("__e"),
        count(lit(1)).as("n_statements"))
      .select(col("canonical_id"), col("schema"), col("dataset"),
        // prop → sorted values array; built from the aggregated entry
        // array (an attribute, so the nested lambdas stay cheap)
        expr("""map_from_entries(transform(
          |  array_distinct(transform(__e, e -> e.prop)),
          |  p -> struct(p, transform(filter(__e, e -> e.prop = p),
          |              e -> e.value))))""".stripMargin).as("properties"),
        col("n_statements"))

  /** Per (dataset, schema) statistics — the `..._stats` materialized
    * view (engine.py:204-220): distinct canonical entities + statement
    * counts. Partial aggregation (map-side combine) makes this one
    * shuffle of pre-aggregated pairs at any scale.
    */
  def stats(statements: DataFrame): DataFrame =
    statements
      .groupBy(col("dataset"), col("schema"))
      .agg(
        countDistinct(col("canonical_id")).as("entities"),
        count(lit(1)).as("statements"))

  /** Sketch-based stats for the 100 TB path: exact countDistinct is a
    * two-shuffle expansion (dataset, schema, canonical_id) before the
    * merge; approx_count_distinct carries one HLL sketch per group
    * through a single map-side-combined shuffle and is mergeable
    * incrementally (the way the reference's stats MV accumulates
    * countState).
    */
  def statsApprox(statements: DataFrame, rsd: Double = 0.02): DataFrame =
    statements
      .groupBy(col("dataset"), col("schema"))
      .agg(
        approx_count_distinct(col("canonical_id"), rsd).as("entities"),
        count(lit(1)).as("statements"))
}
