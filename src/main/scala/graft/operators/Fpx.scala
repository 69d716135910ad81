package graft.operators

import graft.functions.Phonetics
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fingerprint (fpx) derivation, frequency view, xref blocking and
  * canonical resolution — the reference's pre-matching machinery.
  *
  * Reference anchors:
  *  - fpx table + feed: engine.py:162-180,
  *    statements.py:63-82 (`fingerprints_from_statements`)
  *  - fpx_freq materialized view: engine.py:222-236
  *  - blocking query: tests/test_fingerprints.py
  *  - entity→canonical lookup projection: engine.py:259
  */
object Fpx {

  /** Derive fingerprint statements from name-type statements
    * (statements.py:51-57 restricts to name-typed props; the reference
    * further restricts to LegalEntity/Mention schemas — callers filter
    * schemas before this).
    *
    * One row per (entity, blocking token): the full name fingerprint
    * plus every token longer than 5 chars (phonetic.py:32-37).
    */
  def fromStatements(statements: DataFrame): DataFrame = {
    val named = statements
      .filter(col("prop_type") === "name")
      .withColumn("fp", Phonetics.fingerprint(col("value")))
    named
      .select(
        lit("fingerprint").as("algorithm"),
        explode(Phonetics.fpxTokens(col("fp"))).as("value"),
        col("dataset"), col("entity_id"), col("schema"),
        col("prop"), col("prop_type"))
      .filter(length(col("value")) > 0)
  }

  /** The `..._fpx_freq` view: how often each blocking value occurs.
    * Used to drop hyper-frequent blocks before pair generation — the
    * skew guard that keeps xref linear at scale.
    */
  def freq(fpx: DataFrame): DataFrame =
    fpx.groupBy(col("value"))
      .agg(count(lit(1)).as("freq"),
        length(col("value")).cast("bigint").as("len"))

  /** Blocking pairs: distinct (left_id, right_id) entity pairs sharing
    * a fingerprint value held by between `minEntities` and
    * `maxEntities` distinct entities (tests/test_fingerprints.py uses
    * `HAVING entities > 2`; the upper cutoff bounds the quadratic
    * per-block pair blow-up, which is what makes this safe at 100 TB —
    * pair generation is an equi-join on the block value, never a cross
    * join).
    */
  def xrefBlocks(
      fpx: DataFrame,
      minEntities: Long = 2,
      maxEntities: Long = 1000): DataFrame = {
    // One hash-aggregate builds the sorted distinct member set per block
    // (map-side combine keeps the shuffle narrow), then the pair
    // expansion is a pure expression — no self-join, no second pass over
    // the fpx table. The maxEntities cutoff bounds the quadratic
    // per-block expansion (worst row = maxEntities²/2 structs), which is
    // the skew guard that keeps this linear-ish at 100 TB.
    val blocks = fpx.groupBy(col("value"))
      .agg(sort_array(collect_set(col("entity_id"))).as("ids"))
      .filter(size(col("ids")).between(minEntities, maxEntities))
    // Two chained Generates instead of one interpreted
    // flatten-of-nested-transforms: each explode streams pair rows out
    // without materializing the block's full O(n²) pair array in one
    // row, and Generate stays inside codegen.
    blocks
      .select(col("ids"), posexplode(col("ids")).as(Seq("i", "left_id")))
      .select(col("left_id"),
        explode(expr("slice(ids, i + 2, size(ids))")).as("right_id"))
      .distinct()
  }

  /** The xref judgement store semantics (engine.py:181-203): candidate
    * pairs carry (judgement, score, ts, user); re-judging a pair
    * supersedes the old row — ReplacingMergeTree(ts) keyed on the pair.
    * One window inside the (left_id, right_id) clustering; bucketed by
    * pair key the shuffle is elided like the statement store's.
    */
  def latestJudgements(xref: DataFrame): DataFrame =
    ReplacingMerge.latestByKey(
      xref,
      keys = Seq(col("left_id"), col("right_id")),
      version = Seq(col("ts")))

  /** Canonical resolution by identical name fingerprint: every entity
    * sharing a full-name fingerprint resolves to the lexicographically
    * smallest member (the reference keeps this mapping as the
    * `canonical_lookup` projection, engine.py:259). Returns
    * (entity_id, canonical_id).
    */
  def canonicalizeByName(statements: DataFrame): DataFrame = {
    val named = statements
      .filter(col("prop_type") === "name")
      .select(col("entity_id"),
        Phonetics.fingerprint(col("value")).as("fp"))
      .distinct()
    named
      .groupBy(col("fp"))
      .agg(min(col("entity_id")).as("canonical_id"),
        collect_set(col("entity_id")).as("members"))
      .select(explode(col("members")).as("entity_id"), col("canonical_id"))
      .distinct()
  }
}
