package graft.sources

import java.net.URI

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

import scala.util.control.NonFatal

/** Staged-table swap shared by the compact paths of the three stores
  * (statement / fpx / xref) — the OPTIMIZE FINAL analogue writes the
  * deduplicated rows ONCE to a stage table, then this helper points the
  * live name at them.
  *
  * Primary path (round 8): `ALTER TABLE live SET LOCATION <stage dir>`
  * — ONE catalog operation, so there is NO moment where the live name
  * fails to resolve (the pre-r8 DROP-then-RENAME swap had a documented
  * crash window with no table between the two ops). Stage directories
  * are VERSIONED (`<table>_stage_1`, `_stage_2`, …, derived from the
  * live table's current location) so a stage write can never target
  * the directory the live table currently occupies.
  *
  * Crash points on the primary path, in order:
  *   - before SET LOCATION: live table untouched; the stage table is
  *     garbage that [[dropStage]] reclaims on the next compact;
  *   - after SET LOCATION, before the stage entry is detached: live
  *     serves the new rows; a stale stage entry points at the SAME
  *     directory — [[dropStage]] detaches it before dropping (a plain
  *     managed DROP would delete the live rows);
  *   - after the detach: only the orphaned old directory remains; its
  *     delete is best-effort cleanup.
  *
  * Fallbacks, aligned across stores and loud on every downgrade:
  * if the catalog refuses SET LOCATION, the legacy DROP+RENAME swap
  * runs (metadata-only, but with the absent-name window); if it also
  * refuses the RENAME, the staged rows are copied back through the
  * caller's canonical writer (2× write, correctness preserved).
  */
object TableSwap {

  private def ident(table: String): TableIdentifier = TableIdentifier(table)

  private def location(spark: SparkSession, table: String): URI =
    spark.sessionState.catalog.getTableMetadata(ident(table)).location

  /** The stage sibling name for the next compact of `table`: version =
    * one past the version embedded in the live table's current
    * location (1 when the live table still sits in its original,
    * unversioned directory). Monotone per swap, so the stage write
    * never lands in the directory the live table occupies.
    */
  def stageName(spark: SparkSession, table: String): String = {
    val loc = location(spark, table).toString
    val next = "_stage_(\\d+)/*$".r.findFirstMatchIn(loc)
      .map(_.group(1).toInt + 1).getOrElse(1)
    s"${table}_stage_$next"
  }

  /** Point a (possibly live-data-sharing) catalog entry at a throwaway
    * location so a later managed DROP cannot delete rows it does not
    * own. Partition entries must detach too: a managed DROP deletes
    * every PARTITION location individually, not just the table root,
    * so re-pointing the root alone would still delete the live rows of
    * a partitioned stage (dropPartitions with retainData keeps the
    * files).
    */
  private def detach(spark: SparkSession, table: String, loc: URI): Unit = {
    val cat = spark.sessionState.catalog
    val parts = cat.listPartitions(ident(table))
    if (parts.nonEmpty)
      cat.dropPartitions(ident(table), parts.map(_.spec),
        ignoreIfNotExists = true, purge = false, retainData = true)
    spark.sql(s"ALTER TABLE $table SET LOCATION '${loc.toString}_detached'")
  }

  /** Reclaim a stage table left by an earlier crashed compact WITHOUT
    * ever deleting live data: if the stage entry's location is the
    * live table's current location (crash after the swap, before the
    * detach), detach it first; only then drop.
    */
  def dropStage(spark: SparkSession, tmp: String, table: String): Unit = {
    val cat = spark.sessionState.catalog
    if (cat.tableExists(ident(tmp))) {
      val tmpLoc = location(spark, tmp)
      val shared = cat.tableExists(ident(table)) &&
        location(spark, table) == tmpLoc
      if (shared) detach(spark, tmp, tmpLoc)
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
    }
  }

  /** Swap the fully-written stage table `tmp` over `table`.
    * `partitioned` tables get their partition metadata re-synced under
    * the new root (between the location move and the sync, reads see
    * the consistent OLD snapshot — never an unresolvable name).
    * `appendBack` is the caller's canonical writer, used only by the
    * last-resort copy-back fallback.
    */
  def swapIn(
      spark: SparkSession, tmp: String, table: String,
      partitioned: Boolean)(
      appendBack: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val tmpLoc = location(spark, tmp)
    val oldLoc = location(spark, table)
    val moved =
      try { spark.sql(s"ALTER TABLE $table SET LOCATION '$tmpLoc'"); true }
      catch {
        case NonFatal(e) =>
          Console.err.println(s"[graft] TableSwap: catalog refused SET " +
            s"LOCATION on $table (${e.getMessage}); falling back to " +
            "DROP+RENAME (absent-name window)")
          false
      }
    if (moved) {
      if (partitioned)
        spark.sql(s"MSCK REPAIR TABLE $table SYNC PARTITIONS")
      spark.catalog.refreshTable(table)
      try {
        detach(spark, tmp, tmpLoc)
        spark.sql(s"DROP TABLE $tmp")
      } catch {
        // dropping an undetached stage entry would delete the rows the
        // live table now serves — leave the entry for the next
        // compact's dropStage instead
        case NonFatal(e) =>
          Console.err.println(s"[graft] TableSwap: could not detach stage " +
            s"entry $tmp (${e.getMessage}); leaving it for the next " +
            "compact to reclaim")
      }
      try {
        val p = new org.apache.hadoop.fs.Path(oldLoc)
        p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
        ()
      } catch { case NonFatal(_) => () } // orphan dir — harmless
    } else {
      spark.sql(s"DROP TABLE $table")
      try {
        spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
        if (partitioned) spark.sql(s"MSCK REPAIR TABLE $table")
      } catch {
        // at this point DROP already ran; propagating would leave the
        // live name unresolvable, and the staged rows are intact — the
        // copy-back is always correct, just a 2× write, logged loudly
        // so it cannot masquerade as the cheap path
        case NonFatal(e) =>
          Console.err.println(s"[graft] TableSwap: catalog refused RENAME " +
            s"$tmp -> $table (${e.getMessage}); copying rows back through " +
            "the canonical writer (2x write)")
          appendBack(spark.table(tmp))
          spark.sql(s"DROP TABLE $tmp")
      }
    }
  }
}
