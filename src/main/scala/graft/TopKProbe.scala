package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKAggregate

/** Measures graft_top_k's designed regime: a value grain that DWARFS
  * the sketch capacity. q23's corpus has a few hundred distinct terms
  * — there the exact (group, value) exchange is cheap and the sketch's
  * per-row update overhead loses (BASELINE's honest crossover note).
  * This probe builds the other shape: a synthetic skewed stream with
  * ~1M distinct values per group (web-scale URL/domain grain), where
  * the exact path must shuffle the full million-row value grain per
  * group while the sketch's exchange carries ≤ capacity counters per
  * (task, group). Median of 3 per path after a warmup.
  *
  * Correctness cross-check: the head values sit orders of magnitude
  * above the N/(capacity+1) Misra–Gries bound, so the sketch's head
  * set must EQUAL the exact head set (asserted).
  *
  *   sbt "runMain graft.TopKProbe [rows] [groups] [capacity]"
  */
object TopKProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val groups = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val capacity = args.drop(2).headOption.map(_.toInt).getOrElse(1024)
    val k = 10
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    // deterministic skew without rand(): 30% of rows hash into 20 hot
    // values, the rest spread over ~1M tails — per group
    val base = spark.range(rows)
      .select(
        (col("id") % groups).cast("string").as("grp"),
        when(pmod(hash(col("id")), lit(10)) < 3,
          concat(lit("hot"), pmod(hash(col("id"), lit(1)), lit(20))))
          .otherwise(
            concat(lit("t"), pmod(hash(col("id"), lit(2)), lit(1000000))))
          .as("v"))
      .localCheckpoint()

    def timed(f: => Long): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }
    def median3(f: => Long): Double = {
      timed(f)
      (1 to 3).map(_ => timed(f)).sorted.apply(1)
    }

    def sketch() = base.groupBy(col("grp"))
      .agg(TopKAggregate.topK(col("v"), k, capacity).as("top"))
      .select(col("grp"), explode(col("top")))
    def exact() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("n").desc, col("v"))
      base.groupBy(col("grp"), col("v")).agg(count(lit(1)).as("n"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= k)
    }
    // the WEIGHTED arm (q23b's designed regime): the same stream with
    // a deterministic per-row weight 1..100 — the exact path must
    // shuffle the full value grain to SUM weights, the weighted sketch
    // carries ≤ capacity counters per (task, group)
    def wsketch() = base
      .withColumn("w", (pmod(hash(col("v")), lit(100)) + 1).cast("long"))
      .groupBy(col("grp"))
      .agg(TopKAggregate.topKWeighted(col("v"), col("w"), k, capacity)
        .as("top"))
      .select(col("grp"), explode(col("top")))
    def wexact() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("grp"))
        .orderBy(col("n").desc, col("v"))
      base
        .withColumn("w", (pmod(hash(col("v")), lit(100)) + 1).cast("long"))
        .groupBy(col("grp"), col("v")).agg(sum(col("w")).as("n"))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= k)
    }
    val sketchSec = median3(sketch().queryExecution.toRdd.count())
    val exactSec = median3(exact().queryExecution.toRdd.count())
    val wsketchSec = median3(wsketch().queryExecution.toRdd.count())
    val wexactSec = median3(wexact().queryExecution.toRdd.count())
    // head-set equality: hot values carry ~rows*0.3/20/groups each,
    // far above rows/groups/(capacity+1) — and in the weighted arm
    // the per-value weight is constant (hash of the value), so hot
    // weights scale the same way above W/(capacity+1)
    val sk = sketch().select(col("grp"), col("col.value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val ex = exact().select(col("grp"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    require(sk == ex,
      s"head sets differ: sketch-only=${sk -- ex} exact-only=${ex -- sk}")
    val wsk = wsketch().select(col("grp"), col("col.value"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val wex = wexact().select(col("grp"), col("v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    require(wsk == wex,
      s"weighted head sets differ: sketch-only=${wsk -- wex} " +
        s"exact-only=${wex -- wsk}")
    println(s"""{"rows":$rows,"groups":$groups,"capacity":$capacity,""" +
      s""""sketch_sec":$sketchSec,"exact_sec":$exactSec,""" +
      s""""weighted_sketch_sec":$wsketchSec,""" +
      s""""weighted_exact_sec":$wexactSec,""" +
      s""""heads_equal":true,"weighted_heads_equal":true}""")
    spark.stop()
  }
}
