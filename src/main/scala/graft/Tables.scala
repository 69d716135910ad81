package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Parquet-backed table access for the graft engine.
  *
  * The reference stores everything in ClickHouse MergeTree tables
  * (/root/reference/ftm_columnstore/engine.py:130). On Spark the
  * equivalent storage primitive is partitioned parquet read through the
  * DataSource V2 scan: Catalyst pushes predicates and prunes columns, so
  * the ClickHouse skip-indexes/projections have no direct analogue —
  * they fall out of partitioning + min/max stats.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one testdata table. `dir` is an sf directory like
    * /root/testdata/sf0.01.
    *
    * `events.ts` has been written with two physical parquet encodings
    * across testdata generations, so we branch on the schema Spark
    * actually read rather than assuming one:
    *   - TIMESTAMP(NANOS): Spark reads it as a nanosecond LONG under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *     GraftSession/Verify/Bench) — normalize to a microsecond
    *     TIMESTAMP.
    *   - timestamp[us] (no tz): Spark reads TIMESTAMP_NTZ — cast to the
    *     session timestamp type so downstream ops and the DuckDB oracle
    *     see one consistent type. The cast is pushdown-transparent:
    *     under the pinned UTC session Catalyst rewrites `cast(ts) >= X`
    *     onto the raw scan column (verified: ts predicates appear in
    *     the FileScan's DataFilters), so time-range pruning at 100 TB
    *     is not lost to the normalization.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else normalizeNtz(df)
  }

  /** Normalize an `events`-shaped frame's `ts` column to TIMESTAMP,
    * whatever physical encoding the parquet carried (see [[load]]):
    * a nanosecond LONG `ts` gets the micros conversion; anything else
    * falls through to [[normalizeNtz]] (which also covers `ts` being
    * NTZ, and is a no-op only when NO column in the frame is NTZ).
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // nanosecond epoch long -> microsecond timestamp
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => normalizeNtz(df)
    }

  /** Cast every TIMESTAMP_NTZ column to the session timestamp type —
    * the testdata writes its time columns (`events.ts`,
    * `orders.o_orderdate`, `lineitem.l_shipdate`) as timestamp[us]
    * without timezone, which Spark reads as NTZ. Left as NTZ they are
    * the events-bug hazard in waiting: any comparison against a plain
    * TIMESTAMP (`current_timestamp()`, a literal, another table's
    * column) throws DATATYPE_MISMATCH. Under the engine's pinned UTC
    * session the cast is value-identical and pushdown-transparent (see
    * [[load]]), so one consistent type costs nothing.
    */
  def normalizeNtz(df: DataFrame): DataFrame =
    df.schema.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(df)((d, c) =>
      d.withColumn(c, expr(s"cast(`$c` as timestamp)")))
}
