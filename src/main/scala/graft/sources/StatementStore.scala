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
    *
    * Every stored row carries a `deleted` tombstone flag (added as
    * false when the batch doesn't have one) — the
    * `ReplacingMergeTree(ver, is_deleted)` pattern that makes
    * [[pop]]-style deletes append-only.
    *
    * `zorder` (CREATION-time only, like ClickHouse's ORDER BY — a
    * MergeTree's key cannot change in place either; engine.py:130):
    * when the table is first created with `Some((cols, bits))`, every
    * file the store ever writes is internally Z-ORDERED on those
    * columns ([[ZOrderLayout]] — a stored `__z` sort key the readers
    * never see), so range scans on ANY laid-out column prune row
    * groups from footer stats where the canonical canonical_id sort
    * prunes none. On an EXISTING table the parameter is ignored and
    * the creation layout (recorded in table properties) governs —
    * appends and compacts can never diverge from it.
    */
  def append(statements: DataFrame, table: String, buckets: Int = 64,
      zorder: Option[(Seq[String], Int)] = None,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    val withDel =
      if (statements.columns.contains("deleted"))
        statements.withColumn("deleted", col("deleted").cast("boolean"))
      else statements.withColumn("deleted", lit(false))
    val spark = statements.sparkSession
    val existing = spark.catalog.tableExists(table)
    val layout = if (existing) zLayoutOf(spark, table) else zorder
    write(withDel, table, buckets, SaveMode.Append, layout, writerOptions)
    if (!existing) layout.foreach { case (zc, bits) =>
      setZProps(spark, table, zc, bits)
    }
  }

  /** Z-layout metadata of a store (None = canonical canonical_id
    * sort), from the live table's properties — the creation-time
    * ORDER BY declaration every later write must honor.
    */
  def zLayoutOf(spark: SparkSession, table: String)
      : Option[(Seq[String], Int)] = ZOrderLayout.layoutOf(spark, table)

  private def setZProps(
      spark: SparkSession, table: String, zc: Seq[String], bits: Int): Unit =
    ZOrderLayout.declare(spark, table, zc, bits)

  /** The one physical layout: dataset partitions, canonical_id buckets,
    * sorted files. Every write path (append, compact stage) goes
    * through here so the layout can never diverge.
    *
    * Z-ordered stores sort each bucket file by the stored `__z`
    * Morton key instead of canonical_id. The z bounds are WRITE-LOCAL
    * (one min/max pass over the rows being written): `__z` is only a
    * sort key within the files of one write — it is never compared
    * across files and never read by queries — so local bounds give
    * each write an optimal layout with no global state; row-group
    * pruning reads the ORIGINAL columns' min/max, which z-clustering
    * tightens regardless of the bucket scaling. The catalog schema
    * and sort spec carry `__z` from creation, so the SET LOCATION
    * swap keeps catalog metadata TRUE of the files forever (a
    * files-sorted-by-z table whose catalog claimed canonical_id order
    * would let the planner skip a sort it must not — the reason the
    * layout is fixed at creation).
    */
  private def write(
      df: DataFrame, table: String, buckets: Int, mode: SaveMode,
      zorder: Option[(Seq[String], Int)] = None,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    // BucketedLayout: one file per (dataset, bucket) per write,
    // independent of the source's split count (the r12 finding)
    val (rows, sortCols) = zorder match {
      case None => (df, Seq("canonical_id"))
      case Some((zc, bits)) =>
        val (mins, maxs) = ZOrderLayout.bounds(df, zc)
        (df.withColumn("__z",
          ZOrderLayout.zValue(zc.map(col), mins, maxs, bits)),
          Seq("__z"))
    }
    BucketedLayout(rows, buckets, Seq("canonical_id"), Seq("dataset")).write
      .mode(mode)
      .partitionBy("dataset")
      .bucketBy(buckets, "canonical_id")
      .sortBy(sortCols.head, sortCols.tail: _*)
      .options(bloomOpts ++ writerOptions)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Split-block bloom filters on the id column (the ClickHouse
    * `bloom_filter` skip-index class; [[BloomSkip]] measures them):
    * min/max stats cannot prune a POINT lookup on a high-cardinality
    * id when the file is not sorted by it — a z-ordered store's files
    * never are, and even the canonical sort leaves the non-leading id
    * (entity_id) unservable. Adaptive sizing keeps the footer cost
    * proportional to each row group's actual distinct count.
    */
  private val bloomOpts = Map(
    "parquet.bloom.filter.enabled#canonical_id" -> "true",
    "parquet.bloom.filter.adaptive.enabled" -> "true")

  /** Raw read — may contain superseded duplicate keys and tombstones. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** FINAL read: latest version per statement key (ReplacingMergeTree
    * semantics), tombstoned keys dropped. Because the table is bucketed
    * by canonical_id — the leading key column — the dedup window runs
    * inside each bucket without an Exchange. The tombstone flag is a
    * version tiebreaker (a delete at the same last_seen still wins) and
    * is removed from the output: readFinal returns the LOGICAL
    * statement table.
    */
  def readFinal(spark: SparkSession, table: String): DataFrame = {
    // __z is the physical z-order sort key of laid-out stores — pure
    // placement, never part of the logical statement row
    val df = read(spark, table).drop("__z")
    if (!df.columns.contains("deleted"))
      ReplacingMerge.latestByKey(df,
        keys = keyCols.map(col), version = Seq(col("last_seen")))
    else
      ReplacingMerge.latestByKey(df,
        keys = keyCols.map(col),
        version = Seq(col("last_seen"), col("deleted")))
        .filter(!col("deleted"))
        .drop("deleted")
  }

  /** Return-and-remove one entity's statements — the
    * `ClickhouseWriter.pop` contract (store.py:66-74). The remove is
    * APPEND-ONLY: a tombstone row (deleted=true, versioned past the
    * live row) is written per popped statement, so no other entity's
    * data is rewritten — FINAL reads exclude the entity immediately and
    * [[compact]] later drops the dead rows physically. Re-inserting the
    * entity with a newer last_seen resurrects it, exactly like
    * ReplacingMergeTree's is_deleted handling.
    *
    * The popped statements are materialized BEFORE the tombstones are
    * appended (the reference returns a list, not a cursor) — one
    * entity's statements are bounded, so the collect is safe.
    */
  def pop(
      spark: SparkSession,
      table: String,
      entityId: String,
      buckets: Int = 64): DataFrame = {
    val popped = readFinal(spark, table)
      .filter(col("entity_id") === entityId)
    val rows = popped.collect()
    val returned = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), popped.schema)
    if (rows.nonEmpty) {
      val tombstones = returned
        .withColumn("last_seen",
          expr("greatest(current_timestamp(), last_seen + INTERVAL 1 MILLISECOND)"))
        .withColumn("deleted", lit(true))
      append(tombstones, table, buckets)
    }
    returned
  }

  /** Drop one dataset — a partition-level metadata delete, the
    * analogue of the reference's dataset drop (`engine.py` DROP of the
    * dataset scope). No data rewrite for the surviving datasets.
    */
  def dropDataset(spark: SparkSession, table: String, dataset: String): Unit =
    spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (dataset = '$dataset')")

  /** Durable dedup — the OPTIMIZE TABLE ... FINAL DEDUPLICATE twin:
    * rewrite the table with FINAL applied (superseded versions AND
    * tombstoned keys physically dropped).
    *
    * The FINAL rows are written exactly ONCE, to a versioned stage
    * table, which [[TableSwap.swapIn]] points the live name at with a
    * single SET LOCATION — no moment exists with the table absent from
    * the catalog (the crash-window policy, fallbacks included, lives
    * there). At 100 TB: one write per OPTIMIZE, not two.
    */
  def compact(spark: SparkSession, table: String, buckets: Int = 64,
      writerOptions: Map[String, String] = Map.empty): Unit = {
    val tmp = TableSwap.stageName(spark, table)
    TableSwap.dropAllStages(spark, table)
    // the creation layout governs the rewrite: a z-ordered store is
    // re-laid-out with COMPACT-global bounds (the whole corpus in one
    // write = the optimal z placement — OPTIMIZE improving on the
    // appends' write-local bounds, exactly a MergeTree merge)
    val layout = zLayoutOf(spark, table)
    // deleted=false restored so the stage table keeps the physical
    // schema and later appends line up against the catalog.
    write(readFinal(spark, table).withColumn("deleted", lit(false)),
      tmp, buckets, SaveMode.Overwrite, layout, writerOptions)
    // properties ride the stage too, so the DROP+RENAME fallback
    // cannot strip the layout declaration
    layout.foreach { case (zc, bits) => setZProps(spark, tmp, zc, bits) }
    TableSwap.swapIn(spark, tmp, table, partitioned = true)(df =>
      write(df.drop("__z"), table, buckets, SaveMode.Append, layout,
        writerOptions))
  }
}
