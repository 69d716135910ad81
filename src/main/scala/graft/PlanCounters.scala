package graft

/** The plan-shape counters [[graft.PlanAudit]] prints and
  * PlanShapeSpec pins — ONE definition, so the audit tool can never
  * silently drift from the spec it is documented to mirror.
  */
object PlanCounters {

  /** Materialized shuffle Exchanges (broadcast and reused excluded). */
  def shuffles(plan: String): Int =
    "(?<!Broadcast)(?<!Reused)Exchange".r.findAllIn(plan).length

  /** Broadcast exchanges — joins that stay broadcast. */
  def broadcasts(plan: String): Int =
    "BroadcastExchange".r.findAllIn(plan).length

  /** Scans with non-empty PushedFilters. */
  def pushedScans(plan: String): Int =
    "PushedFilters: \\[[^\\]]".r.findAllIn(plan).length
}
