package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory with graft's standard configuration —
  * one place for the settings every entry point (Verify, Bench, Cli,
  * user code) must agree on.
  */
object GraftSession {

  /** Local-mode builder. `cpus` sizes both the master and the shuffle
    * partitions: on a real cluster set `spark.sql.shuffle.partitions`
    * ≈ 2-3× total cores and let AQE coalesce.
    */
  def local(cpus: Int, aqe: Boolean = true): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", aqe.toString)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        sys.env.getOrElse("GRAFT_WAREHOUSE", "/tmp/graft_warehouse"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
