package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IntervalJoin

/** Diagnostic main: measures the three faces of the range-containment
  * join — the NAIVE plan (equi-join on the key with the range as a
  * residual filter: |points_k| · |windows_k| intermediate pairs per
  * key), the [[graft.operators.IntervalJoin]] bin decomposition, and
  * the same naive query under the armed
  * [[graft.plans.RewriteRangeJoin]] rule — on two data shapes:
  *
  *   - the REAL events corpus (q24's 2-hour attribution): short
  *     per-user histories, the benign distribution where the naive
  *     residual is merely mediocre;
  *   - a HOT-KEY synthetic (one user owning `hotN` views AND `hotN`
  *     points over a long range): the shape that turns the naive form
  *     quadratic — hotN² residual pairs in one task — while the bin
  *     form meets only per-(key, bin) co-residents.
  *
  * All arms must agree on the row count (printed; a mismatch is a
  * bug, not a measurement). One JSON line to stdout.
  *
  * Usage: sbt "runMain graft.RangeJoinProbe [sfDir] [hotN]"
  */
object RangeJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val hotN = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import Probes.median3
    import spark.implicits._

    // ---- real corpus: q24's shape -------------------------------
    val ev = Tables.load(spark, sfDir, "events").localCheckpoint()
    val windows = ev.filter($"event_type" === "view")
      .select($"event_id".as("imp_id"), $"user_id",
        $"ts".as("win_start"),
        ($"ts" + expr("INTERVAL 2 HOURS")).as("win_end"))
    val pts = ev.filter($"event_type".isin("click", "purchase"))
      .select($"event_id", $"user_id", $"ts")
    def realNaive(): Long = pts.join(windows,
      pts("user_id") === windows("user_id") &&
        $"ts" >= $"win_start" && $"ts" < $"win_end").count()
    def realBin(): Long = IntervalJoin.join(pts, "ts", windows,
      "win_start", "win_end", "user_id", binWidth = 7200L).count()
    def realRule(): Long = {
      spark.conf.set(graft.plans.RewriteRangeJoin.BIN_WIDTH_KEY, "7200")
      try realNaive()
      finally spark.conf
        .unset(graft.plans.RewriteRangeJoin.BIN_WIDTH_KEY)
    }
    val nReal = realNaive()
    require(realBin() == nReal && realRule() == nReal,
      "range-join arms disagree on the real corpus")
    val realNaiveSec = median3(realNaive())._1
    val realBinSec = median3(realBin())._1
    val realRuleSec = median3(realRule())._1

    // ---- hot key: one user, hotN views + hotN points ------------
    // views every 60s over hotN minutes, 30-minute windows; points at
    // a 45s cadence. Per-key residual pairs: hotN² for the naive
    // form; ~hotN · (window/cadence) true matches for the bin form.
    val hotViews = spark.range(hotN).select(
        col("id").as("imp_id"), lit(0L).as("user_id"),
        timestamp_seconds(col("id") * 60L).as("win_start"),
        timestamp_seconds(col("id") * 60L + 1800L).as("win_end"))
      .localCheckpoint()
    val hotPts = spark.range(hotN).select(
        col("id").as("event_id"), lit(0L).as("user_id"),
        timestamp_seconds(col("id") * 45L).as("ts"))
      .localCheckpoint()
    def hotNaive(): Long = hotPts.join(hotViews,
      hotPts("user_id") === hotViews("user_id") &&
        $"ts" >= $"win_start" && $"ts" < $"win_end").count()
    def hotBin(): Long = IntervalJoin.join(hotPts, "ts", hotViews,
      "win_start", "win_end", "user_id", binWidth = 1800L).count()
    val nHot = hotBin()
    require(hotNaive() == nHot, "range-join arms disagree on hot key")
    val hotNaiveSec = median3(hotNaive())._1
    val hotBinSec = median3(hotBin())._1

    println(f"""{"probe":"range_join","sf":"$sfDir",""" +
      f""""real_rows":$nReal%d,"real_naive_sec":$realNaiveSec%.3f,""" +
      f""""real_bin_sec":$realBinSec%.3f,""" +
      f""""real_rule_sec":$realRuleSec%.3f,""" +
      f""""hot_n":$hotN%d,"hot_rows":$nHot%d,""" +
      f""""hot_naive_sec":$hotNaiveSec%.3f,""" +
      f""""hot_bin_sec":$hotBinSec%.3f,""" +
      f""""hot_speedup":${hotNaiveSec / hotBinSec}%.1f}""")
    spark.stop()
  }
}
