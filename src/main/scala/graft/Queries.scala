package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The driver-facing query registry (SURVEY.md §2) plus the DuckDB
  * oracle SQL twins.
  *
  * Cross-engine determinism rules used throughout (Spark result must
  * hash-match the DuckDB result value-for-value):
  *   - Money/quantity sums go through DECIMAL(18,2) so parallel
  *     (non-associative) double addition cannot produce engine-specific
  *     low bits; the final value is cast back to DOUBLE (identical
  *     binary64 on both engines).
  *   - Averages are decimal-sum / count — double division of identical
  *     operands is bitwise deterministic.
  *   - Integer aggregates are cast to BIGINT (DuckDB SUM(int) widens to
  *     HUGEINT, Spark to BIGINT).
  *   - No raw timestamps in outputs (formatting differs); buckets are
  *     epoch seconds.
  */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** sum over DECIMAL(18,2) re-cast to double — see class doc. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  // ===========================================================
  // Core relational / OLAP
  // ===========================================================

  /** q1_agg — TPC-H Q1 pricing summary: grouped sum/avg/count.
    * Reference: ftmq aggregations surface (tests/test_store.py:171).
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    t(s, dir, "lineitem")
      .filter($"l_shipdate" < lit("1998-09-01").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(18,4)"))
          .cast("double").as("sum_disc_price"),
        (dsum($"l_quantity") / count(lit(1))).as("avg_qty"),
        (dsum($"l_discount") / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate < TIMESTAMP '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ===========================================================
  // Registry
  // ===========================================================

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _)
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" -> q1AggSql
  )
}
