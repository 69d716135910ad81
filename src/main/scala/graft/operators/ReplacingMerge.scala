package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ClickHouse `ReplacingMergeTree(version)` semantics as an explicit
  * Spark operator.
  *
  * The reference's statement table collapses duplicate keys to the row
  * with the highest `last_seen` (engine.py:160,
  * `OPTIMIZE TABLE ... FINAL DEDUPLICATE` at engine.py:115-117). In
  * ClickHouse that happens asynchronously at merge time; here it is a
  * deterministic window — applied lazily at read ("FINAL") or during
  * compaction jobs.
  *
  * Scale: one hash shuffle on the key columns; with the statement store
  * bucketed by `canonical_id` the shuffle is elided entirely
  * (Exchange reuse), so FINAL-on-read stays cheap at 100 TB.
  */
object ReplacingMerge {

  /** Keep exactly one row per `keys`: the one with the greatest
    * `version` columns (compared in order, all descending). `tiebreak`
    * columns must make the ordering total so results are deterministic.
    */
  def latestByKey(
      df: DataFrame,
      keys: Seq[Column],
      version: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(version.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
