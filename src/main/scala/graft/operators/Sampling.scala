package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the corpus-rebalancing step of a
  * training-data pipeline (e.g. downsample the dominant language so the
  * mix matches a target distribution, C4/RefinedWeb style).
  *
  * The sampling decision is a pure per-row hash test: a row is kept iff
  * `u(row) < rate(stratum)` where `u` is a uniform [0,1) value derived
  * from the md5 of the row's stable id. That makes the sample
  *   - deterministic: re-running selects the SAME rows (unlike
  *     `df.sample`, whose seed is per-partition-layout and shifts when
  *     the input resplits), so a pipeline re-run is reproducible;
  *   - scan-local: no shuffle, no window, no per-stratum state — the
  *     rate table broadcasts and every executor filters independently,
  *     which is the only shape that survives a stratum with billions
  *     of rows (a per-stratum row_number window would hot-spot one
  *     partition per stratum).
  */
object Sampling {

  /** Uniform [0,1) from the first 8 md5 hex chars of `id` salted with
    * `seed` — 32 bits of hash over 2^32, exactly reproducible in any
    * engine with md5 (the DuckDB oracle recomputes it bit-identically).
    */
  def hashU(seed: Column, id: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit(":"),
      id.cast("string"))), 1, 8), 16, 10).cast("long") / lit(4294967296.0)

  /** Keep each row of `df` with probability `rates(stratum)` (default
    * `defaultRate`), decided by the deterministic hash of `id`.
    * `rates` is driver-literal (a handful of strata); it compiles into
    * the filter expression itself, so the plan is a bare scan+filter.
    */
  def stratified(
      df: DataFrame, stratum: Column, id: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      seed: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    df.filter(hashU(lit(seed), id) < rate)
  }
}
