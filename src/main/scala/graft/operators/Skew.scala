package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation primitives (SURVEY.md §5).
  *
  * AQE's skew-join split handles sort-merge joins at runtime; explicit
  * salting is for the cases AQE can't rewrite — hot keys in
  * aggregations feeding a join, or broadcast-ineligible dimension
  * blow-ups. Both forms keep the operation an equi-join/aggregation on
  * (key, salt), so the hot key's rows spread over `salts` reducers.
  */
object Skew {

  /** Salted equi-join: the skewed (big) side scatters each row onto a
    * deterministic salt derived from its whole row hash; the small side
    * replicates across every salt. Result == plain inner equi-join on
    * `key`, but a hot key occupies `salts` partitions instead of one.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      salts: Int): DataFrame = {
    val bigS = big.withColumn("__salt",
      pmod(hash(big.columns.map(col): _*), lit(salts)))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for hot grouping keys: aggregate
    * per (key, salt) first, then merge the partials. `partial` must be
    * decomposable (sum/count/min/max); `merge` combines the partial
    * column named `valueCol`.
    */
  def twoPhaseAgg(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Column => Column,
      merge: Column => Column,
      valueCol: String): DataFrame =
    df.withColumn("__salt",
      pmod(hash(df.columns.map(col): _*), lit(salts)))
      .groupBy(key.as("__k"), col("__salt"))
      .agg(partial(col(valueCol)).as("__p"))
      .groupBy(col("__k"))
      .agg(merge(col("__p")).as(valueCol))
}
