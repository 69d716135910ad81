package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Statements
import graft.model.Statements.PropSpec

/** Specs for custom optimizer rules (the test session runs with
  * GraftExtensions, so PruneStaticExplodeFilter sits inside the
  * operator-optimization fixed point exactly like production sessions).
  */
class PlansSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PruneStaticExplodeFilter: names-only feed scans one prop column") {
    val feed = graft.operators.Fpx.fromStatements(
      Queries.statements(spark, sf), Seq("fingerprint"))
    val plan = feed.queryExecution.executedPlan.toString
    // the prop_type='name' filter statically prunes the non-name
    // unpivot elements; column pruning then drops their inputs — the
    // scans must read the name columns but NOT the other prop columns
    // (check the ReadSchema segments: bare names like p_type are
    // substrings of unrelated tokens like prop_type)
    val readSchemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(readSchemas.nonEmpty, s"no ReadSchema in plan:\n$plan")
    val readCols = readSchemas.flatMap(_.split(",")).map(_.split(":")(0)).toSet
    assert(readCols.contains("c_name") && readCols.contains("p_name"),
      s"scan lost a name column, read: $readCols\n$plan")
    for (dead <- Seq("c_mktsegment", "c_acctbal", "c_nationkey", "p_brand",
        "p_type", "p_size", "p_retailprice"))
      assert(!readCols.contains(dead),
        s"$dead should be pruned from the names-only scan, read: $readCols")
  }

  test("PruneStaticExplodeFilter: pruned feed equals a hand-restricted unpivot") {
    import spark.implicits._
    val full = Statements.unpivot(
      Tables.load(spark, sf, "customer"),
      concat(lit("customer-"), $"c_custkey"),
      schema = "Customer", dataset = "ds",
      Seq(
        PropSpec("name", "name", $"c_name"),
        PropSpec("mktsegment", "string", $"c_mktsegment"),
        PropSpec("acctbal", "number", $"c_acctbal")),
      lastSeen = to_timestamp(lit("2024-06-01 00:00:00")))
      .filter($"prop_type" === "name")
    val restricted = Statements.unpivot(
      Tables.load(spark, sf, "customer"),
      concat(lit("customer-"), $"c_custkey"),
      schema = "Customer", dataset = "ds",
      Seq(PropSpec("name", "name", $"c_name")),
      lastSeen = to_timestamp(lit("2024-06-01 00:00:00")))
    val a = full.collect().map(_.toString).sorted
    val b = restricted.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("PruneStaticExplodeFilter: randomized filter/prop-set equivalence") {
    import spark.implicits._
    // seeded sweep: random prop subsets × random filters (static tag
    // conjuncts, row-dependent value conjuncts, mixes). For each case,
    // the rule-pruned full unpivot must equal the unpivot restricted by
    // hand to exactly the props the filter admits.
    val rnd = new scala.util.Random(42)
    val allProps = Seq(
      PropSpec("name", "name", $"c_name"),
      PropSpec("mktsegment", "string", $"c_mktsegment"),
      PropSpec("acctbal", "number", $"c_acctbal"),
      PropSpec("nation", "number", $"c_nationkey"))
    def unpivotOf(props: Seq[PropSpec]) = Statements.unpivot(
      Tables.load(spark, sf, "customer"),
      concat(lit("customer-"), $"c_custkey"),
      schema = "Customer", dataset = "ds", props,
      lastSeen = to_timestamp(lit("2024-06-01 00:00:00")))
    for (i <- 1 to 12) {
      val props = rnd.shuffle(allProps).take(1 + rnd.nextInt(allProps.size))
      val admitted = props.filter(_ => rnd.nextBoolean())
      val tagFilter =
        if (admitted.isEmpty) lit(false)
        else col("prop").isin(admitted.map(_.prop): _*)
      val rowFilter = rnd.nextInt(3) match {
        case 0 => length(col("value")) > 1 // row-dependent, undecidable
        case 1 => col("value").isNotNull
        case _ => lit(true)
      }
      val full = unpivotOf(props).filter(tagFilter && rowFilter)
      val hand = (if (admitted.isEmpty) unpivotOf(props).filter(lit(false))
        else unpivotOf(props.filter(p => admitted.exists(_.prop == p.prop))))
        .filter(rowFilter)
      val a = full.collect().map(_.toString).sorted
      val b = hand.collect().map(_.toString).sorted
      assert(a.sameElements(b),
        s"case $i: props=${props.map(_.prop)} admitted=${admitted.map(_.prop)}")
    }
  }

  test("PruneStaticExplodeFilter leaves row-dependent conjuncts alone") {
    import spark.implicits._
    val df = Seq(("a", 1, 2), ("b", 3, 4)).toDF("k", "x", "y")
    val st = df.select(col("k"), explode(array(
      struct(col("x").cast("long").as("v"), lit("xs").as("tag")),
      struct(col("y").cast("long").as("v"), lit("ys").as("tag")))).as("s"))
    // static conjunct prunes elements; dynamic conjunct still filters rows
    val out = st.filter(col("s.tag") === "ys" && col("s.v") > 2)
      .select(col("k"), col("s.v")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSet == Set(("b", 4L)))
    // all-false static filter → empty result, not an error
    assert(st.filter(col("s.tag") === "zs").count() == 0)
  }

  private def withBinWidth[A](w: Long)(body: => A): A = {
    spark.conf.set(graft.plans.RewriteRangeJoin.BIN_WIDTH_KEY, w.toString)
    try body
    finally spark.conf.unset(graft.plans.RewriteRangeJoin.BIN_WIDTH_KEY)
  }

  test("RewriteRangeJoin: a pure range join stops planning as a " +
    "nested loop and keeps its answer") {
    import spark.implicits._
    val pts = Seq((1L, "p1"), (5L, "p5"), (19L, "p19"), (20L, "p20"),
      (50L, "p50")).toDF("ts", "ptag")
    val iv = Seq((0L, 20L, "a"), (18L, 60L, "b"), (30L, 25L, "inverted"))
      .toDF("s", "e", "itag")
    def q() = pts.join(iv, $"ts" >= $"s" && $"ts" < $"e")
      .select($"ptag", $"itag")
    val naive = q().collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    assert(q().queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"),
      "precondition: the disarmed pure range join is a nested loop")
    for (w <- Seq(1L, 7L, 1000L)) withBinWidth(w) {
      val plan = q().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"width $w: rewrite did not fire:\n$plan")
      assert(plan.contains("Generate"),
        s"width $w: no interval replication in plan:\n$plan")
      val got = q().collect().map(r => (r.getString(0), r.getString(1)))
        .sorted.toSeq
      assert(got == naive, s"width $w changed the answer")
    }
  }

  test("RewriteRangeJoin: equi+range join keeps its answer, multiplicity " +
    "and null/inverted bound semantics") {
    import spark.implicits._
    val pts = Seq((1L, 10L), (1L, 25L), (2L, 10L), (1L, 30L))
      .toDF("k", "ts")
    val iv = Seq((1L, Some(0L), Some(26L), "w1"),
      (1L, Some(9L), Some(11L), "w2"),    // overlaps w1: ts=10 matches both
      (2L, None, Some(99L), "null-lo"),   // null bound never matches
      (2L, Some(5L), None, "null-hi"),
      (1L, Some(40L), Some(30L), "inv"))  // e < s never matches
      .toDF("k", "s", "e", "tag")
    def q() = pts.join(iv,
      pts("k") === iv("k") && $"ts" >= $"s" && $"ts" < $"e")
      .select(pts("k"), $"ts", $"tag")
    val naive = q().collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(naive.nonEmpty)
    withBinWidth(7L) {
      val got = q().collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
      assert(got == naive)
      val plan = q().queryExecution.optimizedPlan.toString
      assert(plan.contains("__graft_bin"), s"rewrite did not fire:\n$plan")
    }
  }

  test("RewriteRangeJoin: naive SQL over events matches the IntervalJoin " +
    "operator (timestamps, epoch-second bins)") {
    Tables.load(spark, sf, "events").createOrReplaceTempView("ev_rrj")
    def sqlQ() = spark.sql(
      """SELECT p.event_id, w.event_id AS imp_id
        |FROM (SELECT * FROM ev_rrj WHERE event_type IN ('click','purchase')) p
        |JOIN (SELECT * FROM ev_rrj WHERE event_type = 'view') w
        |ON p.user_id = w.user_id AND p.ts >= w.ts
        |  AND p.ts < w.ts + INTERVAL 2 HOURS""".stripMargin)
    val viaOperator = Queries.q24IntervalJoin(spark, sf)
      .select("event_id", "imp_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    withBinWidth(7200L) {
      val got = sqlQ().collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(got == viaOperator,
        "rewritten naive SQL diverges from IntervalJoin")
      val plan = sqlQ().queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"))
    }
  }
}
