package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ReplacingMerge

/** The statement store as a Spark-managed table — the analogue of the
  * reference's ClickHouse MergeTree layout (engine.py:130-247), mapped
  * to Spark storage primitives:
  *
  *   - PARTITIONED BY dataset → partition pruning replaces the
  *     `dataset` skip index; a dataset drop is a metadata delete.
  *   - BUCKETED BY canonical_id, sorted → entity assembly, canonical
  *     lookup and statement upserts are shuffle-FREE joins/aggregations
  *     (the bucketing is the ClickHouse ORDER BY key's analogue).
  *   - ReplacingMergeTree(last_seen) → [[ReplacingMerge.latestByKey]]
  *     applied lazily at read ("FINAL") or durably via [[compact]]
  *     (OPTIMIZE FINAL DEDUPLICATE, engine.py:115-117).
  *
  * At 100 TB: one statement table is ~10^11 rows; with 4096 buckets a
  * per-entity operation touches one bucket file per partition, and
  * bucket-pruned point lookups (canonical_id = X) read a single file
  * (for filter-only point lookups set
  * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` —
  * the planner otherwise drops bucketed reading when no join/agg
  * wants the partitioning).
  */
object StatementStore {

  val keyCols: Seq[String] =
    Seq("canonical_id", "entity_id", "prop", "value", "id")

  /** Append a statement batch (the ClickhouseWriter._upsert_batch
    * equivalent, store.py:54-60). Duplicate keys are NOT collapsed at
    * write time — FINAL semantics happen at read or compaction, like
    * the reference's async merges.
    */
  def append(statements: DataFrame, table: String, buckets: Int = 64): Unit =
    statements.write
      .mode(SaveMode.Append)
      .partitionBy("dataset")
      .bucketBy(buckets, "canonical_id")
      .sortBy("canonical_id")
      .format("parquet")
      .saveAsTable(table)

  /** Raw read — may contain superseded duplicate keys. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** FINAL read: latest version per statement key (ReplacingMergeTree
    * semantics). Because the table is bucketed by canonical_id — the
    * leading key column — the dedup window runs inside each bucket
    * without an Exchange.
    */
  def readFinal(spark: SparkSession, table: String): DataFrame = {
    val df = read(spark, table)
    ReplacingMerge.latestByKey(df,
      keys = keyCols.map(col),
      version = Seq(col("last_seen")))
  }

  /** Drop one dataset — a partition-level metadata delete, the
    * analogue of the reference's dataset drop (`engine.py` DROP of the
    * dataset scope). No data rewrite for the surviving datasets.
    */
  def dropDataset(spark: SparkSession, table: String, dataset: String): Unit =
    spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (dataset = '$dataset')")

  /** Durable dedup — the OPTIMIZE TABLE ... FINAL DEDUPLICATE twin:
    * rewrite the table with FINAL applied.
    */
  def compact(spark: SparkSession, table: String, buckets: Int = 64): Unit = {
    // Catalog-agnostic swap: RENAME of a managed table doesn't reliably
    // relocate data under every catalog, so stage the FINAL rows in a
    // sibling table, recreate the original from it, then drop the stage.
    val tmp = table + "_compacted"
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    readFinal(spark, table).write
      .mode(SaveMode.Overwrite)
      .partitionBy("dataset")
      .bucketBy(buckets, "canonical_id")
      .sortBy("canonical_id")
      .format("parquet")
      .saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    append(spark.table(tmp), table, buckets)
    spark.sql(s"DROP TABLE $tmp")
  }
}
