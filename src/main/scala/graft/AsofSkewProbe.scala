package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic main: measures [[graft.operators.AsofJoin.join]] vs
  * [[graft.operators.AsofJoin.joinBucketed]] on a deliberately SKEWED
  * key distribution — one hot key holding `hotN` right rows while
  * `coldKeys` keys hold ~64 each — the data shape the bucketed twin
  * exists for (the plain form sorts the hot key's entire history in
  * one task). Prints one JSON line with both wall times and the row
  * counts (equal counts double-check the equivalence spec's result on
  * synthetic data at volume).
  *
  * Usage: sbt "runMain graft.AsofSkewProbe [hotN] [coldKeys]"
  */
object AsofSkewProbe {
  def main(args: Array[String]): Unit = {
    val hotN = args.headOption.map(_.toInt).getOrElse(4000000)
    val coldKeys = args.drop(1).headOption.map(_.toInt).getOrElse(20000)
    // clamp so a small smoke configuration (hotN < 64) still probes
    // instead of tripping joinBucketed's bucketWidth > 0 require
    val bucketWidth = math.max(1L, hotN / 64L)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import spark.implicits._

    // right side: hot key 0 with hotN rows at ts=1..hotN; cold keys
    // with 64 rows each. left side probes every key sparsely.
    def right: DataFrame = spark.range(hotN).select(
        lit(0L).as("k"), (col("id") + 1).as("ts"),
        col("id").as("payload"))
      .unionByName(spark.range(coldKeys.toLong * 64).select(
        (col("id") % coldKeys + 1).as("k"),
        (col("id") / coldKeys + 1).as("ts"),
        col("id").as("payload")))
    def left: DataFrame = spark.range(hotN / 16).select(
        lit(0L).as("k"), (col("id") * 16 + 3).as("ts"),
        col("id").as("tag"))
      .unionByName(spark.range(coldKeys.toLong * 4).select(
        (col("id") % coldKeys + 1).as("k"),
        (col("id") / coldKeys * 16 + 3).as("ts"),
        col("id").as("tag")))

    def timed(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warmup both paths once, then one timed pass each
    graft.operators.AsofJoin.join(left, right, "k", "ts")
      .queryExecution.toRdd.count()
    graft.operators.AsofJoin
      .joinBucketed(left, right, "k", "ts", bucketWidth = bucketWidth)
      .queryExecution.toRdd.count()
    val (tPlain, nPlain) = timed(
      graft.operators.AsofJoin.join(left, right, "k", "ts")
        .queryExecution.toRdd.count())
    val (tBucketed, nBucketed) = timed(
      graft.operators.AsofJoin
        .joinBucketed(left, right, "k", "ts", bucketWidth = bucketWidth)
        .queryExecution.toRdd.count())
    println(s"""{"hotN":$hotN,"coldKeys":$coldKeys,""" +
      s""""plain_sec":$tPlain,"bucketed_sec":$tBucketed,""" +
      s""""plain_rows":$nPlain,"bucketed_rows":$nBucketed}""")
    spark.stop()
  }
}
