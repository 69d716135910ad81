package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FollowTheMoney entity JSONL ingest — the reference's write path
  * consumes FTM entity dicts (`{"id", "schema", "properties": {prop:
  * [values]}, "datasets"}`) and decomposes them into statement rows
  * (statements.py `Statement.from_entity`, store.py:54-60).
  *
  * One declarative plan: schema-first JSON scan → map explode → value
  * explode. No UDFs, no driver-side iteration — ingest parallelism is
  * file-split parallelism at any scale.
  */
object FtmJson {

  val entitySchema: String =
    "id STRING, schema STRING, datasets ARRAY<STRING>, " +
      "properties MAP<STRING, ARRAY<STRING>>"

  /** Read FTM entity JSONL into slim statement rows. `propTypes` maps
    * prop name → FTM type registry name (default "string") — the
    * reference resolves this from the FTM model; callers pass the
    * relevant slice.
    */
  def statements(
      spark: SparkSession,
      path: String,
      propTypes: Map[String, String] = Map.empty): DataFrame = {
    val typeExpr = propTypes.foldLeft(lit("string")) {
      case (acc, (prop, tpe)) =>
        when(col("prop") === prop, lit(tpe)).otherwise(acc)
    }
    spark.read.schema(entitySchema).json(path)
      .select(
        col("id").as("entity_id"),
        col("id").as("canonical_id"),
        col("schema"),
        element_at(col("datasets"), 1).as("dataset"),
        explode(col("properties")).as(Seq("prop", "values")))
      .select(
        col("entity_id"), col("canonical_id"), col("schema"), col("dataset"),
        col("prop"),
        explode(col("values")).as("value"))
      .filter(col("value").isNotNull)
      .select(
        col("entity_id"), col("canonical_id"), col("schema"), col("dataset"),
        col("prop"), typeExpr.as("prop_type"), col("value"))
  }

  /** Render wide rows as FTM entity JSONL (the inverse, for round-trip
    * tests and export): one JSON object per entity.
    */
  def writeEntities(entities: DataFrame, path: String): Unit =
    entities.select(to_json(struct(entities.columns.map(col): _*)).as("j"))
      .write.mode("overwrite").text(path)

  /** Export a statement table as FTM entity JSONL — assembly to the
    * prop→values map shape, then one JSON object per canonical entity
    * (the reference's entity iteration/export surface).
    */
  def exportEntities(statements: DataFrame, path: String): Unit = {
    val entities = graft.model.Statements.assembleMap(statements)
      .select(
        col("canonical_id").as("id"),
        col("schema"),
        array(col("dataset")).as("datasets"),
        col("properties"))
    writeEntities(entities, path)
  }
}
