package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The integer LOG LATTICE's magnitude guards — the q1 2^53-cents
  * discipline upgraded from comment to code.
  *
  * Transcendental scores (q35 entropy, f27 PMI, t17 BM25) fold on
  * BIGINT nanobits (L(x) = round(log2(x)·10⁹)) so parallel sums are
  * order-free and hash-gate against the oracle with no rounding. The
  * price is a MAGNITUDE bound: Spark's BIGINT wraps silently where
  * DuckDB/ClickHouse widen to HUGEINT/Int128, so a product-bearing
  * lattice term (q35's Σ c·L(c), t17's idf_nb·22·tf·avgl) that
  * outgrows 2⁶³ returns a wrong score with no error and the engines
  * diverge. These guards make the documented bounds STRUCTURAL: the
  * plan REFUSES loudly (raise_error, task failure with the rule named)
  * instead of wrapping — the caller widens through DECIMAL or
  * re-shards the group, but never reads a silently-wrong score.
  *
  * Both guards are cheap scalar `when` branches inside whole-stage
  * codegen — no extra aggregate, no extra exchange.
  */
object Lattice {

  /** Refuse loudly when `c` exceeds `bound`; pass `c` through
    * untouched otherwise. `rule` names the documented bound in the
    * error so the failure is actionable from the task log alone.
    */
  def checked(c: Column, bound: Long, rule: String): Column =
    when(c > lit(bound), raise_error(concat(
      lit(s"graft lattice overflow guard [$rule]: value "),
      c.cast("string"),
      lit(s" > $bound would wrap the BIGINT nanobit fold — widen to " +
        "DECIMAL(38,0) or re-shard the group"))))
      .otherwise(c)

  /** Refuse loudly when `a * b` exceeds `bound`, WITHOUT computing the
    * product (the guard itself must not wrap): `a > bound DIV b` is
    * exactly `a·b > (bound DIV b)·b` for positive b — tight to within
    * one multiple of b below `bound`, always conservative-safe, and
    * overflow-free for any long inputs. `bound` must stay below 2⁵³
    * (the division runs through an exact double) — every lattice
    * product bound does by construction (they bound a FACTOR of a
    * 2⁶³-bounded product, not the product).
    */
  def checkedProduct(a: Column, b: Column, bound: Long, rule: String)
      : Column = {
    require(bound < (1L << 53), s"checkedProduct bound $bound >= 2^53")
    when(a > floor(lit(bound).cast("double") / greatest(b, lit(1L)))
        .cast("long"),
      raise_error(concat(
        lit(s"graft lattice overflow guard [$rule]: "),
        a.cast("string"), lit(" * "), b.cast("string"),
        lit(s" > ~$bound would wrap the BIGINT nanobit fold — cap the " +
          "factor or widen to DECIMAL(38,0)"))))
      .otherwise(a)
  }
}
