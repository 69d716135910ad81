package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Statements
import graft.operators.{Fpx, Xref}
import graft.sources.{FpxStore, FtmJson, StatementStore, XrefStore}

/** Specs for the storage layer: bucketed statement store with FINAL
  * semantics (shuffle-free by construction) and FTM JSONL ingest.
  */
class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Drop from the catalog AND the filesystem: the in-memory catalog
    * forgets tables between JVMs but their warehouse dirs persist.
    */
  private def dropTable(name: String): Unit =
    Probes.dropManaged(spark, name)

  private def sampleStatements = {
    import spark.implicits._
    Seq(
      // id, entity_id, canonical_id, prop, prop_type, schema, value, dataset, last_seen
      ("s1", "e1", "e1", "name", "name", "Person", "Alice", "ds1", ts("2026-01-01 00:00:00")),
      // superseded then updated value for the same key ⇒ FINAL keeps s2's row
      ("s2", "e1", "e1", "country", "string", "Person", "de", "ds1", ts("2026-01-01 00:00:00")),
      ("s2", "e1", "e1", "country", "string", "Person", "de", "ds1", ts("2026-02-01 00:00:00")),
      ("s3", "e2", "e2", "name", "name", "Person", "Bob", "ds1", ts("2026-01-01 00:00:00")))
      .toDF("id", "entity_id", "canonical_id", "prop", "prop_type",
        "schema", "value", "dataset", "last_seen")
  }

  test("statement store: FINAL collapses duplicate keys to max last_seen") {
    dropTable("stmt_spec")
    StatementStore.append(sampleStatements, "stmt_spec", buckets = 4)
    val raw = StatementStore.read(spark, "stmt_spec")
    assert(raw.count() == 4)
    val fin = StatementStore.readFinal(spark, "stmt_spec")
    assert(fin.count() == 3)
    val country = fin.filter(col("prop") === "country").collect()(0)
    assert(country.getAs[Timestamp]("last_seen") == ts("2026-02-01 00:00:00"))
  }

  test("bucketed store: FINAL + entity assembly run without any Exchange") {
    dropTable("stmt_spec2")
    StatementStore.append(sampleStatements, "stmt_spec2", buckets = 4)
    val plan = Statements.assemble(StatementStore.readFinal(spark, "stmt_spec2"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketing should elide every shuffle, got:\n$plan")
  }

  test("compact rewrites the table deduplicated") {
    dropTable("stmt_spec3")
    StatementStore.append(sampleStatements, "stmt_spec3", buckets = 4)
    StatementStore.compact(spark, "stmt_spec3", buckets = 4)
    assert(StatementStore.read(spark, "stmt_spec3").count() == 3)
  }

  test("compact swap: live name stays resolvable, stages reclaim safely") {
    import org.apache.spark.sql.catalyst.TableIdentifier
    import graft.sources.TableSwap
    dropTable("stmt_swap")
    StatementStore.append(sampleStatements, "stmt_swap", buckets = 4)
    def liveLoc(): String = spark.sessionState.catalog
      .getTableMetadata(TableIdentifier("stmt_swap")).location.toString
    // three consecutive compacts: each must take the SET LOCATION path
    // (live location moves to the NEXT versioned stage dir — never the
    // dir it currently occupies), leave no stage entry behind, and
    // keep the partitioned FINAL read correct
    for (i <- 1 to 3) {
      StatementStore.compact(spark, "stmt_swap", buckets = 4)
      assert(liveLoc().stripSuffix("/").endsWith(s"_stage_$i"),
        s"compact $i did not take the no-absent-window path: ${liveLoc()}")
      assert(!spark.catalog.tableExists(s"stmt_swap_stage_$i"),
        s"stage entry $i left attached after a clean swap")
      // every partition entry must sit under the live root: a
      // Hive-style catalog keeps per-partition locations on SET
      // LOCATION, and a spec still pointing under the (deleted) old
      // root reads 0 rows with no error. Compared through normLoc —
      // the catalog spells the same local path file:/x on the table
      // and file:///x on its partitions.
      val root = graft.sources.TableSwap.normLoc(
        java.net.URI.create(liveLoc()))
      spark.sessionState.catalog
        .listPartitions(TableIdentifier("stmt_swap")).foreach { p =>
          val loc = p.storage.locationUri
            .map(graft.sources.TableSwap.normLoc).getOrElse("")
          assert(loc.startsWith(root + "/"),
            s"partition ${p.spec} points outside the live root after " +
              s"compact $i: $loc !under $root")
        }
      val fin = StatementStore.readFinal(spark, "stmt_swap")
      assert(fin.count() == 3 && fin.filter(col("dataset") === "ds1").count() == 3)
    }
    // crash-state recovery: a stage entry sharing the live table's
    // location (crash after the swap, before the detach) must reclaim
    // WITHOUT deleting the rows the live table serves
    spark.sql("CREATE TABLE stmt_swap_stage_9 (x INT) USING parquet")
    spark.sql(s"ALTER TABLE stmt_swap_stage_9 SET LOCATION '${liveLoc()}'")
    TableSwap.dropStage(spark, "stmt_swap_stage_9", "stmt_swap")
    assert(!spark.catalog.tableExists("stmt_swap_stage_9"))
    assert(StatementStore.readFinal(spark, "stmt_swap").count() == 3,
      "dropStage deleted live rows through a shared-location stage entry")
    // stranded-stage recovery: a crash after SET LOCATION leaves the
    // live table sharing a directory with a stage entry whose VERSION
    // the next compact does not target (it stages into N+1), so
    // reclaiming only the next name (the pre-r8-review behavior)
    // stranded the shared entry forever — compact must reclaim ALL
    // stage siblings through the detach guard
    spark.sql("CREATE TABLE stmt_swap_stage_2 (x INT) USING parquet")
    spark.sql(s"ALTER TABLE stmt_swap_stage_2 SET LOCATION '${liveLoc()}'")
    StatementStore.compact(spark, "stmt_swap", buckets = 4)
    assert(!spark.catalog.tableExists("stmt_swap_stage_2"),
      "compact stranded a live-sharing stage entry from a prior crash")
    assert(StatementStore.readFinal(spark, "stmt_swap").count() == 3,
      "reclaiming the stranded stage entry deleted live rows")
    dropTable("stmt_swap")
  }

  test("bucket pruning: a canonical_id point lookup reads one bucket") {
    dropTable("stmt_spec5")
    StatementStore.append(sampleStatements, "stmt_spec5", buckets = 4)
    // filter-only plans need autoBucketedScan off, or the planner
    // drops bucketed reading (and with it bucket pruning)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val plan = StatementStore.read(spark, "stmt_spec5")
        .filter(col("canonical_id") === "e1")
        .queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 4"),
        s"expected single-bucket scan, got:\n$plan")
    } finally spark.conf.set(key, prev)
  }

  test("dropDataset removes one partition, leaves the rest") {
    import spark.implicits._
    dropTable("stmt_spec4")
    val two = sampleStatements.unionByName(
      sampleStatements.withColumn("dataset", org.apache.spark.sql
        .functions.lit("ds2")))
    StatementStore.append(two, "stmt_spec4", buckets = 4)
    assert(StatementStore.read(spark, "stmt_spec4").count() == 8)
    StatementStore.dropDataset(spark, "stmt_spec4", "ds2")
    val left = StatementStore.read(spark, "stmt_spec4")
    assert(left.count() == 4)
    assert(left.select("dataset").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("ds1"))
  }

  test("pop returns the entity's statements and FINAL excludes them") {
    dropTable("stmt_spec6")
    StatementStore.append(sampleStatements, "stmt_spec6", buckets = 4)

    val popped = StatementStore.pop(spark, "stmt_spec6", "e1", buckets = 4)
    // e1 has 2 FINAL statements (s1 name + s2 country, duplicates collapsed)
    assert(popped.count() == 2)
    assert(popped.select("entity_id").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("e1"))

    // append-only delete: raw rows still there plus 2 tombstones …
    assert(StatementStore.read(spark, "stmt_spec6").count() == 6)
    // … but FINAL sees only the untouched entity
    val fin = StatementStore.readFinal(spark, "stmt_spec6")
    assert(fin.count() == 1)
    assert(fin.select("entity_id").collect()(0).getString(0) == "e2")

    // popping a missing entity returns empty and writes nothing
    assert(StatementStore.pop(spark, "stmt_spec6", "zzz", buckets = 4).count() == 0)
    assert(StatementStore.read(spark, "stmt_spec6").count() == 6)

    // compact drops the dead rows physically
    StatementStore.compact(spark, "stmt_spec6", buckets = 4)
    assert(StatementStore.read(spark, "stmt_spec6").count() == 1)

    // re-inserting with a newer version resurrects the entity
    val resurrect = sampleStatements
      .filter(col("entity_id") === "e1")
      .withColumn("last_seen", lit(ts("2031-01-01 00:00:00")))
    StatementStore.append(resurrect, "stmt_spec6", buckets = 4)
    assert(StatementStore.readFinal(spark, "stmt_spec6")
      .filter(col("entity_id") === "e1").count() == 2)
  }

  test("fpx store: FINAL dedups re-ingests; freq and blocks run without Exchange") {
    import spark.implicits._
    dropTable("fpx_spec")
    val stmts = Seq(
      ("e1", "Person", "ds1", "name", "name", "Tchibo Holding AG"),
      ("e2", "Person", "ds1", "name", "name", "Holding Tchibo"),
      ("e3", "Person", "ds2", "name", "name", "Unrelated Corp"))
      .toDF("entity_id", "schema", "dataset", "prop", "prop_type", "value")
    val fpx = Fpx.fromStatements(stmts)
    FpxStore.append(fpx, "fpx_spec", buckets = 4)
    FpxStore.append(fpx, "fpx_spec", buckets = 4) // re-delivery
    assert(FpxStore.read(spark, "fpx_spec").count() == fpx.count() * 2)
    // FINAL = one row per ReplacingMergeTree key (re-delivery AND
    // within-batch phonetic-code collisions collapse)
    assert(FpxStore.readFinal(spark, "fpx_spec").count() ==
      fpx.dropDuplicates(FpxStore.keyCols).count())

    // algorithm slice prunes partitions; value-bucketing elides the
    // groupBy shuffles for both derived views
    val freqPlan = FpxStore.freq(spark, "fpx_spec")
      .queryExecution.executedPlan.toString
    assert(!freqPlan.contains("Exchange"),
      s"freq over the bucketed fpx store should not shuffle:\n$freqPlan")
    // blocks: the allowed SHUFFLE Exchanges are the block-grain
    // generation spread (r15 — descriptor generation must not
    // serialize into one AQE-coalesced task), the chunk-descriptor
    // rebalance, and the final pair-distinct; the sketch-guard's
    // survivor-list BroadcastExchange is fine (it moves a tiny value
    // list, not the table). Everything from the scan through the
    // member-set aggregate must stay in-bucket (plans print top-down,
    // so that means no shuffle BELOW the first ObjectHashAggregate)
    val blocksPlan = FpxStore.blocks(spark, "fpx_spec")
      .queryExecution.executedPlan.toString
    def shuffles(p: String): Int =
      "(?<!Broadcast)Exchange".r.findAllIn(p).length
    assert(shuffles(blocksPlan) <= 3,
      s"only spread + chunk rebalance + pair-distinct may shuffle:\n$blocksPlan")
    val belowAgg = blocksPlan.substring(
      blocksPlan.indexOf("ObjectHashAggregate"))
    assert(shuffles(belowAgg) == 0,
      s"block membership agg should aggregate in-bucket:\n$blocksPlan")

    // the shared-token block pairs e1/e2 ("tchibo" + "holding")
    val pairs = FpxStore.blocks(spark, "fpx_spec").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs == Set(("e1", "e2")))
  }

  test("xref store: upsert without Exchange; reverse projection point lookup") {
    import spark.implicits._
    dropTable("xref_spec")
    dropTable("xref_spec_reverse")
    val mk = (l: String, r: String, j: String, ts: Long) =>
      ("ds", l, "Person", "de", s"cap-$l", "ds", r, "Person", "fr",
        s"cap-$r", j, 0.5, ts, "graft")
    val base = Seq(
      mk("a", "b", "no_judgement", 1L),
      mk("a", "c", "no_judgement", 1L))
      .toDF(Xref.columns: _*)
    XrefStore.append(base, "xref_spec", buckets = 4)
    // re-judge one pair at a later ts — FINAL must supersede
    XrefStore.append(Seq(mk("a", "b", "positive", 2L)).toDF(Xref.columns: _*),
      "xref_spec", buckets = 4)

    val latest = XrefStore.readLatest(spark, "xref_spec")
    assert(latest.count() == 2)
    assert(latest.filter($"right_id" === "b")
      .select("judgement").collect()(0).getString(0) == "positive")
    val plan = latest.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"latest-judgement window should run in-bucket:\n$plan")

    // the reverse projection: right-side-first point lookup
    val rev = XrefStore.lookupByRight(spark, "xref_spec", "b").collect()
    assert(rev.length == 1)
    assert(rev(0).getString(1) == "b" && rev(0).getString(6) == "a")
    assert(rev(0).getString(10) == "positive")
  }

  test("xref store compact: superseded rows physically gone, reverse consistent") {
    import spark.implicits._
    Seq("xref_cspec", "xref_cspec_reverse", "xref_cspec_compacted",
      "xref_cspec_reverse_compacted").foreach(dropTable)
    val mk = (l: String, r: String, j: String, ts: Long) =>
      ("ds", l, "Person", "de", s"cap-$l", "ds", r, "Person", "fr",
        s"cap-$r", j, 0.5, ts, "graft")
    XrefStore.append(Seq(
      mk("a", "b", "no_judgement", 1L),
      mk("a", "c", "no_judgement", 1L)).toDF(Xref.columns: _*),
      "xref_cspec", buckets = 4)
    XrefStore.append(Seq(mk("a", "b", "positive", 2L))
      .toDF(Xref.columns: _*), "xref_cspec", buckets = 4)
    assert(XrefStore.read(spark, "xref_cspec").count() == 3)

    XrefStore.compact(spark, "xref_cspec", buckets = 4)
    // the OPTIMIZE FINAL analogue: the superseded (a,b,ts=1) row is
    // physically gone from BOTH tables, the ts=2 judgement survives
    val main = XrefStore.read(spark, "xref_cspec")
    assert(main.count() == 2)
    assert(main.filter($"right_id" === "b").collect()(0)
      .getAs[String]("judgement") == "positive")
    val rev = spark.table(XrefStore.reverseTable("xref_cspec"))
    assert(rev.count() == 2)
    assert(rev.columns.take(2).toSeq == Seq("right_dataset", "right_id"))
    // reverse rows = exactly the main rows reordered
    assert(rev.select("left_id", "right_id", "judgement", "ts")
      .collect().map(_.toSeq).toSet ==
      main.select("left_id", "right_id", "judgement", "ts")
        .collect().map(_.toSeq).toSet)
    // compacted table keeps the bucketed layout: point lookups and the
    // FINAL window still run without an Exchange
    val plan = XrefStore.readLatest(spark, "xref_cspec")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"compacted xref table must keep its bucketing:\n$plan")
  }

  // r13: source-grain takedown across the remaining stores — the
  // delete story's last two faces (DocStore/VecStore have id-grain
  // pop since r11/r12).
  test("sketch store pop: popped source vanishes from estimates, compact drops rows") {
    import spark.implicits._
    import graft.sources.SketchStore
    Seq("sk_pop", "sk_pop_dels").foreach(dropTable)
    val k = 64
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "keep"),
      (2L, "eta theta iota kappa lambda mu", "keep"),
      (3L, "nu xi omicron pi rho sigma", "gone"))
      .toDF("doc_id", "text", "source")
    SketchStore.applyBatch(spark, docs, "sk_pop", k, batchId = 0L)
    def est(): Map[String, Long] =
      SketchStore.readEstimates(spark, "sk_pop", k).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val before = est()
    assert(before.keySet == Set("keep", "gone"))
    SketchStore.pop(spark, "sk_pop", Seq("gone").toDF("source"))
    // immediate exclusion, survivor unchanged; raw rows still present
    assert(est() == before - "gone")
    assert(spark.table("sk_pop").count() == 2)
    // sticky: a late batch re-appending the popped source stays hidden
    SketchStore.applyBatch(spark,
      Seq((4L, "tau upsilon phi chi psi omega", "gone"))
        .toDF("doc_id", "text", "source"), "sk_pop", k, batchId = 1L)
    assert(est() == before - "gone")
    SketchStore.compact(spark, "sk_pop", k)
    assert(spark.table("sk_pop").count() == 1,
      "compact must physically drop the popped source's sketch rows")
    assert(!spark.catalog.tableExists("sk_pop_dels"),
      "compact must retire the tombstones")
    assert(est() == before - "gone")
  }

  // r13: the heavy-hitters store — version accounting where the KMV
  // store used set algebra (an MG summary merged twice double-counts,
  // so exactly-once must come from the store, not the fold)
  test("topk store: version-accounted fold replay-proof at both grains, pop, compact") {
    import spark.implicits._
    import graft.sources.TopKStore
    Seq("tk_store", "tk_store_dels").foreach(dropTable)
    val cap = 64
    def docs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "source")
    val b0 = docs((1L, "a a a b b c", "s1"), (2L, "x x y", "s2"))
    val b1 = docs((3L, "b b b c", "s1"))
    TopKStore.applyBatch(spark, b0, "tk_store", cap, batchId = 0L)
    TopKStore.applyBatch(spark, b1, "tk_store", cap, batchId = 1L)
    def top(): Map[String, Seq[(String, Long)]] =
      TopKStore.readTopK(spark, "tk_store", 3, cap).collect()
        .map(r => r.getString(0) ->
          r.getSeq[org.apache.spark.sql.Row](1)
            .map(x => (x.getString(0), x.getLong(1))).toSeq).toMap
    val t0 = top()
    assert(t0("s1") == Seq(("b", 5L), ("a", 3L), ("c", 2L)), t0.toString)
    assert(t0("s2") == Seq(("x", 2L), ("y", 1L)))
    // a replayed batch (same batchId, different partitioning) is a
    // no-op: the (source, ver) dedup keeps one row
    TopKStore.applyBatch(spark, b1.repartition(5), "tk_store", cap,
      batchId = 1L)
    assert(top() == t0, "replayed batch double-counted")
    // compact folds to one row per source; served top-k invariant
    TopKStore.compact(spark, "tk_store", cap)
    assert(top() == t0, "compact moved the estimates")
    assert(spark.table("tk_store").groupBy("source").count()
      .collect().forall(_.getLong(1) == 1L), "compact folds to 1 row/source")
    // a raw batch replayed AFTER the compact that folded it sits
    // behind the folded row's version horizon — still a no-op
    TopKStore.applyBatch(spark, b1, "tk_store", cap, batchId = 1L)
    assert(top() == t0, "post-compact replay double-counted")
    // a FRESH batch past the horizon lands normally
    TopKStore.applyBatch(spark, docs((4L, "z z z z", "s2")),
      "tk_store", cap, batchId = 2L)
    assert(top()("s2") == Seq(("z", 4L), ("x", 2L), ("y", 1L)))
    // pop: immediate exclusion, sticky until compact, physical drop
    TopKStore.pop(spark, "tk_store", Seq("s1").toDF("source"))
    assert(!top().contains("s1"))
    TopKStore.applyBatch(spark, docs((5L, "q q", "s1")),
      "tk_store", cap, batchId = 3L)
    assert(!top().contains("s1"), "takedown must be sticky until compact")
    TopKStore.compact(spark, "tk_store", cap)
    assert(spark.table("tk_store").select("source").distinct()
      .collect().map(_.getString(0)).toSet == Set("s2"),
      "compact must physically drop the popped source's rows")
    assert(!spark.catalog.tableExists("tk_store_dels"),
      "compact must retire the tombstones")
    assert(top()("s2") == Seq(("z", 4L), ("x", 2L), ("y", 1L)))
  }

  // r13: the quantile store — the TopKStore version-accounting
  // discipline at KLL grain (a weighted multiset merged twice
  // double-weights, MG's hazard not KMV's immunity)
  test("quantile store: version-accounted fold replay-proof, pop, compact; exact regime") {
    import spark.implicits._
    import graft.sources.QuantileStore
    Seq("ql_store", "ql_store_dels").foreach(dropTable)
    val k = 64 // every source's doc count stays << k: quantiles EXACT
    def docs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "source")
    val b0 = docs((1L, "a a a b b c", "s1"), (2L, "x x y", "s2"))
    val b1 = docs((3L, "b b b c", "s1"))
    QuantileStore.applyBatch(spark, b0, "ql_store", k, batchId = 0L)
    QuantileStore.applyBatch(spark, b1, "ql_store", k, batchId = 1L)
    def q(): Map[String, (Long, Long)] =
      QuantileStore.readQuantiles(spark, "ql_store", k, Seq(0.5, 1.0))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // s1 token counts {6, 4}: p50 = ceil(.5·2)=1st = 4, p100 = 6
    val t0 = q()
    assert(t0 == Map("s1" -> ((4L, 6L)), "s2" -> ((3L, 3L))), t0.toString)
    // a replayed batch (same batchId, different partitioning) is a
    // no-op: the (source, ver) dedup keeps one row
    QuantileStore.applyBatch(spark, b1.repartition(5), "ql_store", k,
      batchId = 1L)
    assert(q() == t0, "replayed batch double-weighted")
    // compact folds to one row per source; served quantiles invariant
    QuantileStore.compact(spark, "ql_store", k)
    assert(q() == t0, "compact moved the quantiles")
    assert(spark.table("ql_store").groupBy("source").count()
      .collect().forall(_.getLong(1) == 1L), "compact folds to 1 row/source")
    // a raw batch replayed AFTER the compact that folded it sits
    // behind the folded row's version horizon — still a no-op
    QuantileStore.applyBatch(spark, b1, "ql_store", k, batchId = 1L)
    assert(q() == t0, "post-compact replay double-weighted")
    // a FRESH batch past the horizon lands normally
    QuantileStore.applyBatch(spark, docs((4L, "z z z z z", "s2")),
      "ql_store", k, batchId = 2L)
    assert(q()("s2") == ((3L, 5L)), q().toString)
    // pop: immediate exclusion, sticky until compact, physical drop
    QuantileStore.pop(spark, "ql_store", Seq("s1").toDF("source"))
    assert(!q().contains("s1"))
    QuantileStore.applyBatch(spark, docs((5L, "q q", "s1")),
      "ql_store", k, batchId = 3L)
    assert(!q().contains("s1"), "takedown must be sticky until compact")
    QuantileStore.compact(spark, "ql_store", k)
    assert(spark.table("ql_store").select("source").distinct()
      .collect().map(_.getString(0)).toSet == Set("s2"),
      "compact must physically drop the popped source's rows")
    assert(!spark.catalog.tableExists("ql_store_dels"),
      "compact must retire the tombstones")
    assert(q()("s2") == ((3L, 5L)))
  }

  // r13: the exact-bitmap store — union algebra absorbs replays, the
  // version horizon protects the USER-grain delete (the forget no
  // sketch store can do exactly)
  test("bitmap store: exact audiences, replay-immune, user takedown scrubs physically") {
    import spark.implicits._
    import graft.sources.BitmapStore
    Seq("bm_store", "bm_store_dels").foreach(dropTable)
    def ev(rows: (String, Long)*) = rows.toDF("event_type", "user_id")
    BitmapStore.applyBatch(spark, ev(("view", 1L), ("view", 2L),
      ("click", 2L)), "bm_store", batchId = 0L)
    BitmapStore.applyBatch(spark, ev(("view", 3L), ("click", 2L)),
      "bm_store", batchId = 1L)
    def aud(): Map[String, Long] =
      BitmapStore.readAudience(spark, "bm_store").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(aud() == Map("view" -> 3L, "click" -> 1L))
    // replayed batch rows: set union absorbs them with NO version
    // dedup (the SketchStore immunity)
    BitmapStore.applyBatch(spark, ev(("view", 3L), ("click", 2L)),
      "bm_store", batchId = 1L)
    assert(aud() == Map("view" -> 3L, "click" -> 1L), "replay moved bits")
    // user-grain takedown: immediate masking at every face
    BitmapStore.popUsers(spark, "bm_store", Seq(2L).toDF("user_id"))
    assert(aud() == Map("view" -> 2L, "click" -> 0L))
    // compact scrubs PHYSICALLY and retires the tombstones
    BitmapStore.compact(spark, "bm_store")
    assert(!spark.catalog.tableExists("bm_store_dels"))
    assert(aud() == Map("view" -> 2L, "click" -> 0L))
    // decode check the honest way: rebuild user 2's singleton bitmap
    // via the aggregate and intersect with every stored row
    val single = Seq(2L).toDF("user_id")
      .agg(graft.functions.Bitmap.bitmap(col("user_id")).as("bm"))
      .collect()(0).getSeq[Long](0)
    val leak = spark.table("bm_store")
      .select(graft.functions.Bitmap.bitmapAndCount(col("bm"),
        typedLit(single)).as("x"))
      .collect().map(_.getLong(0)).sum
    assert(leak == 0L, "popped user's bits survived the compact")
    // post-compact replay of the folded batch: behind the version
    // horizon — scrubbed stays scrubbed even with tombstones retired
    BitmapStore.applyBatch(spark, ev(("view", 3L), ("click", 2L)),
      "bm_store", batchId = 1L)
    assert(aud() == Map("view" -> 2L, "click" -> 0L),
      "post-compact replay resurrected a scrubbed user")
    // a FRESH batch past the horizon lands normally (user 2 may
    // legitimately return)
    BitmapStore.applyBatch(spark, ev(("click", 9L)), "bm_store",
      batchId = 2L)
    assert(aud() == Map("view" -> 2L, "click" -> 1L))
    // compact is idempotent
    BitmapStore.compact(spark, "bm_store")
    BitmapStore.compact(spark, "bm_store")
    assert(aud() == Map("view" -> 2L, "click" -> 1L))
  }

  test("xref store popDataset: judgements excluded, mapping rebuilt at compact") {
    import spark.implicits._
    Seq("xref_pop", "xref_pop_reverse", "xref_pop_mapping",
      "xref_pop_dsdels").foreach(dropTable)
    val mkd = (lds: String, l: String, rds: String, r: String,
        j: String, ts: Long) =>
      (lds, l, "Person", "de", s"cap-$l", rds, r, "Person", "fr",
        s"cap-$r", j, 0.5, ts, "graft")
    // a(dsA) —positive— b(dsB) —positive— c(dsB): one component; the
    // a-b edge is the only row touching dsA
    XrefStore.applyBatch(spark, Seq(
      mkd("dsA", "a", "dsB", "b", "positive", 1L),
      mkd("dsB", "b", "dsB", "c", "positive", 1L))
      .toDF(Xref.columns: _*), "xref_pop", ver = 1L, buckets = 4)
    def mapping(): Map[String, String] =
      XrefStore.readMapping(spark, "xref_pop").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
    val pre = mapping()
    assert(pre.keySet == Set("a", "b", "c") && pre.values.toSet.size == 1,
      s"one merged component expected: $pre")
    XrefStore.popDataset(spark, "xref_pop", Seq("dsA").toDF("dataset"))
    // immediate exclusion from every judgement face (either side)
    assert(XrefStore.readLatest(spark, "xref_pop").collect()
      .map(r => (r.getAs[String]("left_id"), r.getAs[String]("right_id")))
      .toSet == Set(("b", "c")))
    assert(XrefStore.lookupByRight(spark, "xref_pop", "b").count() == 0,
      "the dsA-touching judgement must be gone from reverse lookups")
    // the mapping is derived state: stale until compact (documented)
    assert(mapping().keySet == Set("a", "b", "c"))
    XrefStore.compact(spark, "xref_pop", buckets = 4)
    // physical drop from main + reverse, tombstones retired, mapping
    // rebuilt by the full resolver over the survivors — the popped
    // dataset's entity is GONE from readMapping
    assert(XrefStore.read(spark, "xref_pop").count() == 1)
    assert(spark.table(XrefStore.reverseTable("xref_pop")).count() == 1)
    assert(!spark.catalog.tableExists("xref_pop_dsdels"))
    val post = mapping()
    assert(post.keySet == Set("b", "c") && post.values.toSet.size == 1,
      s"survivors stay merged, popped entity vanishes: $post")
    // and the rebuilt mapping equals a from-scratch resolver run
    val scratch = Xref.resolverMapping(XrefStore.readLatest(spark, "xref_pop"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(post == scratch)
  }

  test("export → ingest round-trip preserves the entity") {
    import spark.implicits._
    val stmts = Seq(
      ("e1", "e1", "Person", "ds", "name", "name", "Ann"),
      ("e1", "e1", "Person", "ds", "name", "name", "Annie"),
      ("e1", "e1", "Person", "ds", "country", "string", "fr"))
      .toDF("entity_id", "canonical_id", "schema", "dataset", "prop",
        "prop_type", "value")
    FtmJson.exportEntities(stmts, "/tmp/graft_export_spec")
    val back = FtmJson.statements(spark, "/tmp/graft_export_spec",
      Map("name" -> "name"))
    val rows = back.collect()
      .map(r => (r.getAs[String]("prop"), r.getAs[String]("value"))).toSet
    assert(rows == Set(("name", "Ann"), ("name", "Annie"), ("country", "fr")))
    assert(back.select("schema").distinct().collect()(0).getString(0) == "Person")
  }

  test("ftm jsonl round-trip preserves statement rows") {
    import spark.implicits._
    val entities = Seq(
      ("p1", "Person", Seq("dsx"), Map("name" -> Seq("Ann", "Annie"), "country" -> Seq("fr"))))
      .toDF("id", "schema", "datasets", "properties")
    FtmJson.writeEntities(entities, "/tmp/graft_ftm_spec")
    val stmts = FtmJson.statements(spark, "/tmp/graft_ftm_spec",
      Map("name" -> "name")).collect()
    assert(stmts.length == 3)
    val byProp = stmts.groupBy(_.getAs[String]("prop"))
    assert(byProp("name").map(_.getAs[String]("value")).toSet == Set("Ann", "Annie"))
    assert(byProp("name").head.getAs[String]("prop_type") == "name")
    assert(byProp("country").head.getAs[String]("prop_type") == "string")
  }

  test("doc store: double-insert index, incremental probe, compact rebuild") {
    import spark.implicits._
    import graft.sources.DocStore
    dropTable("doc_spec")
    dropTable("doc_spec_bands")
    val textA = "the quick brown fox jumps over the lazy dog again today"
    val stored = Seq(
      (1L, textA, "s"),
      (2L, "completely different content with no shared phrases at all", "s"),
      (3L, "a third unrelated document mentioning other things entirely", "s"))
      .toDF("doc_id", "text", "source")
    DocStore.append(stored, "doc_spec", buckets = 4)
    // double insert: one index row per (doc, band) — 6 bands at 12/2
    assert(DocStore.bands(spark, "doc_spec").count() == 3L * 6)
    // the probe: a near-twin of stored doc 1, a novel doc, and stored
    // doc 1 itself (self-match must be excluded by id)
    val newDocs = Seq(
      (10L, textA, "s"),
      (11L, "novel text with fresh vocabulary nothing before matches", "s"),
      (1L, textA, "s"))
      .toDF("doc_id", "text", "source")
    val cands = DocStore.nearDupCandidates(spark, "doc_spec", newDocs)
    assert(cands.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L)))
    // probe plan: the batch keys broadcast onto ONE stored-index scan;
    // nothing below the first aggregate may shuffle the corpus side
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"batch keys must broadcast onto the stored index:\n$plan")
    // FINAL read dedups a re-delivery (in-bucket, no Exchange)
    DocStore.append(stored, "doc_spec", buckets = 4)
    assert(DocStore.read(spark, "doc_spec").count() == 6L)
    assert(DocStore.readFinal(spark, "doc_spec").count() == 3L)
    val finalPlan = DocStore.readFinal(spark, "doc_spec")
      .queryExecution.executedPlan.toString
    assert(!finalPlan.contains("Exchange"),
      s"FINAL over the id-bucketed store must not shuffle:\n$finalPlan")
    // compact: durable dedup, index rebuilt from the deduped docs,
    // probe still answers identically
    DocStore.compact(spark, "doc_spec", buckets = 4)
    assert(DocStore.read(spark, "doc_spec").count() == 3L)
    assert(DocStore.bands(spark, "doc_spec").count() == 3L * 6)
    assert(DocStore.nearDupCandidates(spark, "doc_spec", newDocs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((1L, 10L)))
  }

  // r13: the incremental face of exact-substring dedup (d14). The
  // anchor index is the store's third table; the probe must equal the
  // BATCH algorithm on the union corpus restricted to stored×batch
  // pairs — run geometry included — and survive append/pop/compact.
  test("doc store anchors: dupSpanCandidates ≡ batch d14 restricted to " +
    "stored×batch; maintained through append, pop, compact") {
    import spark.implicits._
    import graft.sources.DocStore
    import graft.operators.Dedup
    for (t <- Seq("doc_anch", "doc_anch_bands", "doc_anch_anchors",
      "doc_anch_anchorsmeta", "doc_anch_dels")) dropTable(t)
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 60).map(i => s"w$i")
    def randText(n: Int): Vector[String] =
      Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
    // stored corpus: 20 random docs; batch: 8 docs, half carrying
    // verbatim slices of stored docs (the planted runs), plus one
    // boilerplate gram repeated across MANY stored docs to exercise
    // the df cap identically on both paths
    val boiler = Vector("b1", "b2", "b3", "b4", "b5", "b6")
    val storedTok = (0L until 20L).map { i =>
      val base = randText(40)
      // docs 0-11 all carry the boilerplate run → df(boiler grams) = 12+
      i -> (if (i < 12) base.take(20) ++ boiler ++ base.drop(20) else base)
    }.toMap
    val batchTok = (100L until 108L).map { i =>
      val base = randText(30)
      val planted = if (i % 2 == 0) {
        val src = storedTok(i % 20)
        val at = rnd.nextInt(src.length - 10)
        base.take(10) ++ src.slice(at, at + 10) ++ base.drop(10)
      } else base
      i -> (if (i == 101L) planted.take(5) ++ boiler ++ planted.drop(5)
            else planted)
    }.toMap
    val stored = storedTok.toSeq.map { case (id, ws) =>
      (id, ws.mkString(" "), "s") }.toDF("doc_id", "text", "source")
    val batch = batchTok.toSeq.map { case (id, ws) =>
      (id, ws.mkString(" "), "s") }.toDF("doc_id", "text", "source")
    val (k, minRun, maxDf) = (4, 6, 8)
    DocStore.append(stored, "doc_anch", buckets = 4)
    assert(!DocStore.hasAnchors(spark, "doc_anch"))
    DocStore.initAnchors(spark, "doc_anch", k = k, buckets = 4)
    assert(DocStore.hasAnchors(spark, "doc_anch") &&
      DocStore.anchorK(spark, "doc_anch") == k)
    // the oracle: batch d14 over the union, restricted to pairs with
    // one stored and one batch side, re-oriented to store/batch order
    def restricted(): Set[(Long, Long, Long, Long, Long)] =
      Dedup.dupSpans(stored.union(batch), k, minRun, maxDf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .collect {
          case (a, b, sa, sb, len) if a < 100L && b >= 100L =>
            (a, b, sa, sb, len)
          case (a, b, sa, sb, len) if a >= 100L && b < 100L =>
            (b, a, sb, sa, len)
        }.toSet
    def probe(): Set[(Long, Long, Long, Long, Long)] =
      DocStore.dupSpanCandidates(spark, "doc_anch", batch, minRun, maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val want = restricted()
    assert(want.nonEmpty, "fixture must plant at least one run")
    assert(want.exists(_._5 >= 10L), "a planted 10-token run must survive")
    assert(probe() == want)
    // plan: the batch side broadcasts; the stored index never shuffles
    val plan = DocStore
      .dupSpanCandidates(spark, "doc_anch", batch, minRun, maxDf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"probed hashes must broadcast onto the index scan:\n$plan")
    // maintenance: append keeps the index in step automatically
    val extra = Seq((50L, batchTok(100L).mkString(" "), "s"))
      .toDF("doc_id", "text", "source")
    DocStore.append(extra, "doc_anch", buckets = 4)
    val afterAppend = probe()
    assert(afterAppend.exists(_._1 == 50L),
      "an appended twin of a batch doc must pair with it")
    // pop: a taken-down doc leaves the candidate space immediately
    DocStore.pop(spark, "doc_anch", Seq(50L).toDF("doc_id"))
    assert(probe() == want, "popped doc must vanish from candidates")
    // compact: anchors rebuilt from FINAL docs; answers unchanged
    DocStore.compact(spark, "doc_anch", buckets = 4)
    assert(probe() == want)
    assert(spark.table("doc_anch_anchors")
      .filter(col("doc_id") === 50L).count() == 0L,
      "compact must physically drop the popped doc's anchor rows")
    // misuse guards
    assertThrows[IllegalArgumentException] {
      DocStore.dupSpanCandidates(spark, "doc_anch", batch, minRun = k - 1)
    }
  }

  // r12: the file-count pin behind BucketedLayout. Spark's bucketBy
  // writer emits one file per (task × partition × bucket); without the
  // pre-write layout shuffle a 16-split source writes 16× the files
  // and pruned reads drown in opens (the probe-store finding: 1,600 →
  // 330k files). Every store write must hold this bound.
  test("bucketed writes emit one file per bucket regardless of source splits") {
    import spark.implicits._
    import graft.sources.{DocStore, VecStore}
    Seq("layout_docs", "layout_docs_bands", "layout_vecs",
      "layout_vecs_cents").foreach(dropTable)
    val docs = (1L to 64L)
      .map(i => (i, s"document number $i with some words to shingle on", "s"))
      .toDF("doc_id", "text", "source")
      .repartition(16) // a many-split source — the regression trigger
    DocStore.append(docs, "layout_docs", buckets = 4)
    assert(spark.table("layout_docs").inputFiles.length == 4,
      "doc store must write exactly one file per bucket")
    assert(spark.table("layout_docs_bands").inputFiles.length <= 4,
      "band index must write at most one file per non-empty bucket")
    // a SECOND append adds at most one file per bucket again
    DocStore.append(docs.filter(col("doc_id") <= 8L), "layout_docs",
      buckets = 4)
    assert(spark.table("layout_docs").inputFiles.length <= 8)
    // the partitioned vector store: at most one file per non-empty
    // (list, bucket)
    val emb = Tables.load(spark, sf, "embeddings").repartition(16)
    VecStore.init(spark, "layout_vecs", emb, col("label"), buckets = 4)
    val lists = VecStore.centroids(spark, "layout_vecs").count()
    val vfiles = spark.table("layout_vecs").inputFiles.length
    assert(vfiles <= lists * 4,
      s"vector store wrote $vfiles files for $lists lists x 4 buckets")
  }

  // r12: the out-of-band compact split. The heavy stage build runs
  // while appends (and pops) keep landing; the cheap finish catches up
  // the delta, swaps, and retires tombstones ONLY when none landed
  // after the stage snapshot. Everything appended mid-build survives;
  // everything popped mid-build stays hidden.
  test("doc store compactStage/compactFinish: delta catch-up, mid-build pop stays sticky") {
    import spark.implicits._
    import graft.sources.DocStore
    Seq("doc_oob", "doc_oob_bands", "doc_oob_dels").foreach(dropTable)
    val textA = "the quick brown fox jumps over the lazy dog again today"
    val textB = "completely different content with no shared phrases at all"
    DocStore.append(
      Seq((1L, textA, "s"), (2L, textB, "s")).toDF("doc_id", "text", "source"),
      "doc_oob", buckets = 4)
    // bloat: re-deliver doc 1
    DocStore.append(
      Seq((1L, textA, "s")).toDF("doc_id", "text", "source"),
      "doc_oob", buckets = 4)
    assert(DocStore.read(spark, "doc_oob").count() == 3L)
    // phase 1: the heavy build — live tables untouched, still serving
    val st = DocStore.compactStage(spark, "doc_oob", buckets = 4)
    assert(DocStore.read(spark, "doc_oob").count() == 3L,
      "stage build must not touch the live table")
    assert(spark.table(st.docsTmp).count() == 2L,
      "stage must hold the FINAL rows")
    // mid-build events: an append the stage missed, and a takedown
    DocStore.append(
      Seq((4L, "a brand new document that arrived during the rewrite", "s"))
        .toDF("doc_id", "text", "source"), "doc_oob", buckets = 4)
    DocStore.pop(spark, "doc_oob",
      Seq(2L).toDF("doc_id"))
    // phase 2: append-bounded finish — delta caught up, swap, pop sticky
    DocStore.compactFinish(spark, "doc_oob", st, buckets = 4)
    assert(DocStore.readFinal(spark, "doc_oob")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L),
      "delta doc must survive; replay collapsed; mid-build pop hidden")
    assert(DocStore.bands(spark, "doc_oob")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L),
      "index covers stage+delta docs; the mid-build pop's rows shed " +
        "at the NEXT compact (its tombstone was retained)")
    // ...but the serving face excludes the popped doc regardless
    assert(DocStore.nearDupCandidates(spark, "doc_oob",
      Seq((20L, textB, "s")).toDF("doc_id", "text", "source"))
      .collect().isEmpty,
      "mid-build pop must stay hidden from the probe face")
    // the mid-build tombstone landed AFTER the stage snapshot — it
    // must be RETAINED (the stage never honored it physically)
    assert(spark.catalog.tableExists("doc_oob_dels"),
      "tombstones newer than the stage snapshot must not retire")
    // the next (inline) compact physically drops doc 2 and retires
    DocStore.compact(spark, "doc_oob", buckets = 4)
    assert(DocStore.read(spark, "doc_oob")
      .collect().map(_.getLong(0)).toSet == Set(1L, 4L))
    assert(!spark.catalog.tableExists("doc_oob_dels"))
    // a quiet build (no mid-build events) retires tombstones directly
    DocStore.pop(spark, "doc_oob", Seq(4L).toDF("doc_id"))
    val st2 = DocStore.compactStage(spark, "doc_oob", buckets = 4)
    DocStore.compactFinish(spark, "doc_oob", st2, buckets = 4)
    assert(DocStore.read(spark, "doc_oob")
      .collect().map(_.getLong(0)).toSet == Set(1L),
      "pre-stage pop must drop physically at finish")
    assert(!spark.catalog.tableExists("doc_oob_dels"),
      "an unchanged tombstone set retires at finish")
  }

  // r11: the takedown path — the corpus-store delete the statement
  // store's tombstones already have. Popped ids leave every read face
  // immediately, drop physically (index rows included) at compact,
  // and stay popped across a re-delivered append.
  test("doc store pop: immediate exclusion, compact drops docs AND index rows, tombstones retire") {
    import spark.implicits._
    import graft.sources.DocStore
    Seq("doc_pop", "doc_pop_bands", "doc_pop_dels").foreach(dropTable)
    val textA = "the quick brown fox jumps over the lazy dog again today"
    val stored = Seq(
      (1L, textA, "s"),
      (2L, "completely different content with no shared phrases at all", "s"),
      (3L, "a third unrelated document mentioning other things entirely", "s"))
      .toDF("doc_id", "text", "source")
    DocStore.append(stored, "doc_pop", buckets = 4)
    val newDocs = Seq((10L, textA, "s")).toDF("doc_id", "text", "source")
    def cands(): Set[(Long, Long)] =
      DocStore.nearDupCandidates(spark, "doc_pop", newDocs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands() == Set((1L, 10L)))
    val popped = DocStore.pop(spark, "doc_pop", Seq(1L).toDF("doc_id"))
    assert(popped.collect().map(_.getLong(0)).toSet == Set(1L))
    // every read face excludes the popped id BEFORE any compaction
    assert(DocStore.readFinal(spark, "doc_pop")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    assert(cands().isEmpty)
    // sticky: a re-delivered copy of the popped doc stays hidden and
    // is dropped by the compact below
    DocStore.append(Seq((1L, textA, "s")).toDF("doc_id", "text", "source"),
      "doc_pop", buckets = 4)
    assert(DocStore.readFinal(spark, "doc_pop").count() == 2)
    assert(cands().isEmpty)
    // compact: doc rows and their band index rows physically gone, the
    // counts reconcile (6 bands per surviving doc), dels retired
    DocStore.compact(spark, "doc_pop", buckets = 4)
    assert(DocStore.read(spark, "doc_pop").count() == 2)
    assert(DocStore.bands(spark, "doc_pop").count() == 2L * 6)
    assert(!spark.catalog.tableExists("doc_pop_dels"))
    assert(cands().isEmpty)
    // the crash-before-retire state (tombstones naming already-removed
    // ids) is a no-op anti-join, never a resurrection or an error
    assert(DocStore.pop(spark, "doc_pop", Seq(1L).toDF("doc_id"))
      .count() == 0)
    assert(DocStore.readFinal(spark, "doc_pop").count() == 2)
    // after compaction the id is free to ingest again
    DocStore.compact(spark, "doc_pop", buckets = 4)
    DocStore.append(Seq((1L, textA, "s")).toDF("doc_id", "text", "source"),
      "doc_pop", buckets = 4)
    assert(DocStore.readFinal(spark, "doc_pop").count() == 3)
    assert(cands() == Set((1L, 10L)))
  }

  // r10: the ONE crash that matters for a double-insert write path is
  // the one BETWEEN the two inserts. Drive every multi-table store
  // through it in a single spec — a regular file squatting on the
  // SECOND table's location makes that insert throw after the first
  // landed, which is exactly the crash state — and assert each
  // store's documented direction: the failure is LOUD (append
  // throws, nothing is silently swallowed), the surviving state is
  // the documented safe side, and plain re-delivery repairs it (the
  // at-least-once contract every streaming ingest already relies on).
  test("crash between inserts: every store fails loud, lands its documented side, repairs on re-delivery") {
    import spark.implicits._
    import graft.sources.{DocStore, VecStore}
    val wh = new java.io.File("/tmp/graft_warehouse")

    // --- DocStore: INDEX first. Orphan index rows are the loud
    // direction (candidates referencing absent docs die at text
    // verification); docs-without-index would be silent false
    // negatives on every later probe.
    Seq("crash_docs", "crash_docs_bands").foreach(dropTable)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "s"),
      (2L, "completely different content with no shared phrases", "s"))
      .toDF("doc_id", "text", "source")
    assert(new java.io.File(wh, "crash_docs").createNewFile())
    intercept[Exception] { DocStore.append(docs, "crash_docs", buckets = 4) }
    assert(spark.table("crash_docs_bands").count() == 2L * 6,
      "the index (first insert) must have landed before the crash")
    assert(!spark.catalog.tableExists("crash_docs"),
      "the docs (second insert) must not exist after the crash")
    assert(new java.io.File(wh, "crash_docs").delete())
    DocStore.append(docs, "crash_docs", buckets = 4)
    assert(DocStore.readFinal(spark, "crash_docs").count() == 2)
    // replayed index rows are duplicates the probe's set build absorbs;
    // compact makes the repair durable and exact
    DocStore.compact(spark, "crash_docs", buckets = 4)
    assert(DocStore.bands(spark, "crash_docs").count() == 2L * 6)

    // --- XrefStore: MAIN (source of truth) first. The projection can
    // only LAG (reverse ⊆ main — stale lookups until repair), never
    // hold phantom judgements main does not have.
    Seq("crash_xref", "crash_xref_reverse").foreach(dropTable)
    val mk = (l: String, r: String, j: String, ts: Long) =>
      ("ds", l, "Person", "de", s"cap-$l", "ds", r, "Person", "fr",
        s"cap-$r", j, 0.5, ts, "graft")
    val xref = Seq(mk("a", "b", "positive", 1L)).toDF(Xref.columns: _*)
    assert(new java.io.File(wh, "crash_xref_reverse").createNewFile())
    intercept[Exception] {
      graft.sources.XrefStore.append(xref, "crash_xref", buckets = 4)
    }
    assert(spark.table("crash_xref").count() == 1,
      "main (first insert) must have landed before the crash")
    assert(!spark.catalog.tableExists("crash_xref_reverse"))
    assert(new java.io.File(wh, "crash_xref_reverse").delete())
    graft.sources.XrefStore.append(xref, "crash_xref", buckets = 4)
    // re-delivery dupes collapse in the FINAL window on both sides
    assert(graft.sources.XrefStore.readLatest(spark, "crash_xref")
      .count() == 1)
    assert(graft.sources.XrefStore.lookupByRight(spark, "crash_xref", "b")
      .count() == 1)

    // --- Statements + fpx (the st8/Cli double insert): STATEMENTS
    // (source of truth) first. A crash leaves the blocking index
    // behind (missed xref candidates until repair) but never fpx rows
    // pointing at statements that do not exist.
    Seq("crash_stmt", "crash_stmt_fpx").foreach(dropTable)
    val stmts = sampleStatements
    assert(new java.io.File(wh, "crash_stmt_fpx").createNewFile())
    intercept[Exception] {
      StatementStore.append(stmts, "crash_stmt", buckets = 4)
      FpxStore.append(
        Fpx.fromStatements(stmts, schemas = Fpx.DefaultSchemas),
        "crash_stmt_fpx", buckets = 4)
    }
    assert(spark.table("crash_stmt").count() == 4,
      "statements (first insert) must have landed before the crash")
    assert(!spark.catalog.tableExists("crash_stmt_fpx"))
    assert(new java.io.File(wh, "crash_stmt_fpx").delete())
    StatementStore.append(stmts, "crash_stmt", buckets = 4)
    FpxStore.append(
      Fpx.fromStatements(stmts, schemas = Fpx.DefaultSchemas),
      "crash_stmt_fpx", buckets = 4)
    assert(StatementStore.readFinal(spark, "crash_stmt").count() == 3,
      "re-delivered statements must collapse at FINAL")
    assert(spark.table("crash_stmt_fpx").count() > 0)

    // --- VecStore: NO second table to drift — the inverted-list index
    // is the partition layout of the one vector table. The only
    // multi-write is init's (cents, corpus) pair, and a crash between
    // them leaves a store every read/probe refuses LOUDLY (the table
    // does not resolve) rather than answering incompletely.
    Seq("crash_vec", "crash_vec_cents").foreach(dropTable)
    val vecs = Tables.load(spark, sf, "embeddings")
    assert(new java.io.File(wh, "crash_vec").createNewFile())
    intercept[Exception] {
      VecStore.init(spark, "crash_vec", vecs,
        org.apache.spark.sql.functions.col("label"), buckets = 4)
    }
    assert(spark.catalog.tableExists("crash_vec_cents"))
    assert(!spark.catalog.tableExists("crash_vec"))
    intercept[Exception] { VecStore.readFinal(spark, "crash_vec").count() }
    assert(new java.io.File(wh, "crash_vec").delete())
    VecStore.init(spark, "crash_vec", vecs,
      org.apache.spark.sql.functions.col("label"), buckets = 4)
    assert(VecStore.readFinal(spark, "crash_vec").count() == vecs.count())
  }

  // r11: the STORE-level twin of PropertySpec's randomized incremental-
  // resolver stream — same contract (served ≡ recompute after every
  // batch) but through the real tables, exercising what the operator
  // spec cannot: the versioned delta appends, the FINAL serve window,
  // the staged-swap recompute on retractions, and ver monotonicity
  // across a mixed stream.
  test("xref mapping store tracks the recompute over a randomized batch stream") {
    import spark.implicits._
    for (t <- Seq("prop_xref", "prop_xref_reverse", "prop_xref_mapping"))
      dropTable(t)
    val rnd = new scala.util.Random(23)
    def xrefRows(
        v: Seq[(String, String, String, Long)]) = {
      val pairs = v.toDF("left_id", "right_id", "judgement0", "ts0")
      Xref.candidates(
        pairs.select(col("left_id"), col("right_id")),
        pairs.select(col("left_id").as("entity_id")).union(
          pairs.select(col("right_id"))).distinct()
          .select(col("entity_id"), lit("ds").as("dataset"),
            lit("P").as("schema"), lit("de").as("country"),
            col("entity_id").as("caption")))
        .drop("judgement", "ts")
        .join(pairs.withColumnRenamed("judgement0", "judgement")
          .withColumnRenamed("ts0", "ts"), Seq("left_id", "right_id"))
        .select(Xref.columns.map(col): _*)
    }
    var ts = 0L
    var history = Vector.empty[(String, String, String, Long)]
    for (step <- 1 to 8) {
      val batch = (0 until 1 + rnd.nextInt(3)).map { _ =>
        ts += 1
        val a = rnd.nextInt(10)
        val b = (a + 1 + rnd.nextInt(9)) % 10
        val j = if (rnd.nextInt(4) == 0) "negative" else "positive"
        (f"e$a%02d", f"e$b%02d", j, ts)
      }
      history ++= batch
      XrefStore.applyBatch(spark, xrefRows(batch), "prop_xref", ver = ts)
      val got = XrefStore.readMapping(spark, "prop_xref").collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      val expect = Xref.resolverMapping(
        XrefStore.readLatest(spark, "prop_xref")).collect()
        .map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == expect, s"step $step: store=$got recompute=$expect " +
        s"history=$history")
    }
    // compaction mid-history preserves the serve
    val beforeCompact = XrefStore.readMapping(spark, "prop_xref")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    XrefStore.compactMapping(spark, "prop_xref")
    val afterCompact = XrefStore.readMapping(spark, "prop_xref")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(afterCompact == beforeCompact)
    assert(spark.table("prop_xref_mapping").count() == beforeCompact.size)
  }

  test("z-order layout: exact Morton interleave, box pruning beats linear sort") {
    import spark.implicits._
    import graft.sources.ZOrderLayout
    // exact interleave on a hand grid: bits=2, identity bounds [0,3]
    val hand = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 3L), (2L, 1L))
      .toDF("x", "y")
      .select(col("x"), col("y"), ZOrderLayout.zValue(
        Seq(col("x"), col("y")), Seq(0L, 0L), Seq(3L, 3L), bits = 2).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // morton2(x,y) with x at bit 0: (x0,y0,x1,y1)
    def morton(x: Long, y: Long): Long =
      (x & 1) | ((y & 1) << 1) | (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3)
    for (((x, y), z) <- hand)
      assert(z == morton(x, y), s"($x,$y): $z != ${morton(x, y)}")
    // three columns interleave at stride 3: (x0,y0,w0,x1,y1,w1)
    val hand3 = Seq((1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
      (2L, 0L, 0L), (3L, 3L, 3L), (1L, 2L, 3L))
      .toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"), ZOrderLayout.zValue(
        Seq(col("x"), col("y"), col("w")), Seq(0L, 0L, 0L),
        Seq(3L, 3L, 3L), bits = 2).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
    def morton3(x: Long, y: Long, w: Long): Long =
      (x & 1) | ((y & 1) << 1) | ((w & 1) << 2) |
        (((x >> 1) & 1) << 3) | (((y >> 1) & 1) << 4) | (((w >> 1) & 1) << 5)
    for (((x, y, w), z) <- hand3)
      assert(z == morton3(x, y, w), s"($x,$y,$w): $z != ${morton3(x, y, w)}")
    // layout quality: 100k uniform 2-D rows into 16 files under three
    // layouts; row-group stats straight from the footers
    val rnd = new scala.util.Random(3)
    val data = (1 to 100000).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("x", "y")
    val base = java.nio.file.Files
      .createTempDirectory("graft_zorder").toString
    data.repartition(16).write.mode("overwrite")
      .parquet(s"$base/unsorted")
    data.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(s"$base/linear")
    ZOrderLayout.write(data, s"$base/zorder", Seq("x", "y"), numFiles = 16)
    // values survive the reorder
    val got = spark.read.parquet(s"$base/zorder")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = data.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.sameElements(want), "z-order lost or mutated rows")
    val yOnly = Map("y" -> ((0L, 4095L)))
    val box = Map("x" -> ((0L, 4095L)), "y" -> ((0L, 4095L)))
    def frac(p: (Int, Int)): Double = p._1.toDouble / p._2
    // a y-range predicate: the linear-by-x layout prunes NOTHING
    // (every file spans all y), the z layout reads only the files
    // whose y-bits intersect — structurally 4/16 for a 1/16 range
    val linY = ZOrderLayout.matchingRowGroups(s"$base/linear", yOnly)
    val zY = ZOrderLayout.matchingRowGroups(s"$base/zorder", yOnly)
    val unY = ZOrderLayout.matchingRowGroups(s"$base/unsorted", yOnly)
    assert(frac(linY) > 0.9, s"linear should span all y: $linY")
    assert(frac(unY) > 0.9, s"unsorted should span all y: $unY")
    assert(frac(zY) <= 0.45, s"z-order failed to prune on y: $zY")
    // the 2-D corner box: z reads a corner tile, unsorted reads all
    val zBox = ZOrderLayout.matchingRowGroups(s"$base/zorder", box)
    val unBox = ZOrderLayout.matchingRowGroups(s"$base/unsorted", box)
    assert(frac(unBox) > 0.9, s"unsorted should span the box: $unBox")
    assert(zBox._1 <= 2, s"z-order box should be ~1 tile: $zBox")
    // honest trade, pinned so nobody "fixes" it: linear beats z on its
    // OWN leading column (1 file vs ~4) — z is the multi-predicate
    // layout, not a strict upgrade
    val xOnly = Map("x" -> ((0L, 4095L)))
    val linX = ZOrderLayout.matchingRowGroups(s"$base/linear", xOnly)
    val zX = ZOrderLayout.matchingRowGroups(s"$base/zorder", xOnly)
    assert(linX._1 <= 2 && zX._1 >= linX._1, s"trade inverted: $linX $zX")
  }

  // The STORE face of the z-order layout (r14, the round-13 verdict's
  // "wire ZOrderLayout into a store"): a statement store created with
  // a z-order declaration keeps every file it ever writes internally
  // Morton-ordered on the declared columns — the MergeTree ORDER BY
  // analogue (engine.py:130), fixed at creation exactly like
  // ClickHouse's, carried by a stored __z sort key the readers never
  // see. Gates: (1) FINAL semantics are bit-identical to a canonical
  // twin store holding the same rows; (2) footer-measured row-group
  // pruning on a 2-D time box is ≥ 4× better than the twin's; (3) the
  // layout survives compact (which re-lays-out at corpus-global
  // bounds) and appends after creation.
  test("statement store z-order layout: FINAL unchanged, stored-table row groups prune >= 4x") {
    import spark.implicits._
    import graft.sources.ZOrderLayout
    Seq("zstore", "zstore_plain").foreach(dropTable)
    // 120k statements across 3 appends; first_seen and last_seen are
    // INDEPENDENT pseudo-random spreads (multiplicative hashing) over
    // one year so neither dim orders the other — the layout has to
    // earn its pruning
    val base = 1700000000L
    def batch(k: Int) = spark.range(40000)
      .select(
        concat(lit(s"s$k-"), col("id")).as("id"),
        concat(lit("e"), pmod(col("id"), lit(5000))).as("entity_id"),
        concat(lit("e"), pmod(col("id"), lit(5000))).as("canonical_id"),
        lit("name").as("prop"), lit("name").as("prop_type"),
        lit("Person").as("schema"),
        concat(lit("v"), col("id")).as("value"),
        lit("ds1").as("dataset"),
        timestamp_seconds(lit(base) +
          pmod(col("id") * 2654435761L + k, lit(31536000L))).as("first_seen"),
        timestamp_seconds(lit(base) +
          pmod(col("id") * 40503L + k * 7919L, lit(31536000L))).as("last_seen"))
    // 64 KiB row groups: the probe needs per-file granularity fine
    // enough to expose the z clustering (production files are GBs
    // with 128 MB groups — the same groups-per-file ratio)
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    (0 until 3).foreach { k =>
      StatementStore.append(batch(k), "zstore", buckets = 2,
        zorder = Some((Seq("first_seen", "last_seen"), 16)),
        writerOptions = opts)
      StatementStore.append(batch(k), "zstore_plain", buckets = 2,
        writerOptions = opts)
    }
    assert(StatementStore.zLayoutOf(spark, "zstore")
      .contains((Seq("first_seen", "last_seen"), 16)))
    assert(StatementStore.zLayoutOf(spark, "zstore_plain").isEmpty)
    // (1) FINAL parity: same logical rows, no __z anywhere
    def finalSet(t: String) = StatementStore.readFinal(spark, t)
      .collect().map(_.toSeq).toSet
    assert(!StatementStore.readFinal(spark, "zstore").columns.contains("__z"))
    assert(finalSet("zstore") == finalSet("zstore_plain"),
      "z layout changed FINAL semantics")
    // (2) pruning on the stored table, straight from the footers: a
    // ~6-week box on both time dims (micros — TIMESTAMP_MICROS files)
    def dirOf(t: String): String = {
      val f = spark.table(t).inputFiles.head
      new java.io.File(new java.net.URI(f)).getParent
    }
    val lo = (base + 100 * 86400L) * 1000000L
    val hi = (base + 142 * 86400L) * 1000000L
    val box = Map("first_seen" -> ((lo, hi)), "last_seen" -> ((lo, hi)))
    val zHit = ZOrderLayout.matchingRowGroups(dirOf("zstore"), box)
    val pHit = ZOrderLayout.matchingRowGroups(dirOf("zstore_plain"), box)
    assert(zHit._2 >= 8 && pHit._2 >= 8,
      s"need multiple row groups to measure: $zHit $pHit")
    info(s"stored-table box pruning: z=${zHit._1}/${zHit._2} " +
      s"plain=${pHit._1}/${pHit._2} row groups")
    assert(pHit._1 * 1L >= 4L * zHit._1.max(1),
      s"z pruning under 4x: z=$zHit plain=$pHit")
    // (2b) PAGE grain — the grain Spark's vectorized reader filters
    // at (column indexes → row ranges, intersected across the two
    // dims): the z store decodes a small fraction of the ROWS the
    // canonical store must
    val zRows = ZOrderLayout.matchingRows(dirOf("zstore"), box)
    val pRows = ZOrderLayout.matchingRows(dirOf("zstore_plain"), box)
    info(s"page-grain rows selected: z=${zRows._1}/${zRows._2} " +
      s"plain=${pRows._1}/${pRows._2}")
    assert(zRows._2 == pRows._2, "row totals must agree")
    assert(zRows._1 > 0, "the box must select something")
    assert(zRows._1 * 4 <= pRows._1,
      s"z page-grain under 4x: z=$zRows plain=$pRows")
    // (3) the layout survives compact (corpus-global re-layout) and
    // FINAL is still identical
    StatementStore.compact(spark, "zstore", buckets = 2,
      writerOptions = opts)
    assert(StatementStore.zLayoutOf(spark, "zstore")
      .contains((Seq("first_seen", "last_seen"), 16)))
    assert(finalSet("zstore") == finalSet("zstore_plain"),
      "compact broke FINAL on the z store")
    val zHit2 = ZOrderLayout.matchingRowGroups(dirOf("zstore"), box)
    assert(zHit2._1 * 4L <= zHit2._2,
      s"post-compact layout lost its pruning: $zHit2")
    // (4) bloom filters — the POINT-LOOKUP half of the skip story
    // (r14, verdict item 7): the z layout deliberately scatters
    // canonical_id, so min/max can't serve an id probe; the id-column
    // bloom filters the store writes skip nearly every value-free row
    // group from the footer alone
    import graft.sources.BloomSkip
    val zdir = dirOf("zstore")
    val present = BloomSkip.skippableRowGroups(zdir, "canonical_id", "e123")
    val absent = BloomSkip.skippableRowGroups(zdir, "canonical_id", "e-nope")
    info(s"bloom skip: present id ${present._1}/${present._2}, " +
      s"absent id ${absent._1}/${absent._2} row groups skippable")
    assert(present._2 == present._3, s"row groups missing blooms: $present")
    assert(absent._1 * 100 >= absent._2 * 95,
      s"absent id should skip ~everything: $absent")
    assert(present._1 * 4 >= present._2 * 3,
      s"present id should skip >= 75%: $present")
    assert(present._1 < present._2,
      "the id's own row groups must survive the probe")
    // (5) probe-type vs column-physical-type mismatch (r14 advisor):
    // a Long probe on the BINARY canonical_id column must return the
    // documented conservative answer — covered but unproven — never
    // throw from parquet hash/decode internals
    val mismatch = BloomSkip.skippableRowGroups(zdir, "canonical_id", 42L)
    assert(mismatch._1 == 0 && mismatch._2 == mismatch._3,
      s"type mismatch must be covered-but-unproven: $mismatch")
  }

  // DocStore z-order (r15, verdict item 9): the creation-time layout
  // declaration extended from the statement store to the corpus store,
  // for the "recent high-quality docs" read shape — a time box AND a
  // score range, neither of which a doc_id sort can prune. Same
  // contract as the statement-store test above: declared once at
  // creation, recorded in table properties, honored by every append
  // and compact; FINAL semantics and the near-dup index unaffected.
  test("doc store z-order layout: FINAL unchanged, probe intact, row groups prune >= 4x") {
    import graft.sources.{DocStore, ZOrderLayout}
    Seq("zdocs", "zdocs_bands", "zdocs_plain", "zdocs_plain_bands")
      .foreach(dropTable)
    // 3 appends x 40k docs; ingest ts and quality score are INDEPENDENT
    // pseudo-random spreads over one year / [0, 100k) so neither dim
    // orders the other
    val base = 1700000000L
    // per-doc-unique words: no shingle is shared across docs, so the
    // band index stays one-candidate-per-probe (hot-key flooding would
    // test the cutoff, not the layout)
    def batch(k: Int) = spark.range(40000)
      .select(
        (col("id") + k * 40000L).as("doc_id"),
        concat(
          lit("a"), col("id") + k * 40000L,
          lit(" b"), col("id") + k * 40000L,
          lit(" c"), col("id") + k * 40000L,
          lit(" d"), col("id") + k * 40000L).as("text"),
        lit(s"src$k").as("source"),
        timestamp_seconds(lit(base) +
          pmod(col("id") * 2654435761L + k, lit(31536000L))).as("ts"),
        pmod(col("id") * 40503L + k * 7919L, lit(100000L)).as("score"))
    val opts = Map("parquet.block.size" -> (64 * 1024).toString)
    (0 until 3).foreach { k =>
      DocStore.append(batch(k), "zdocs", buckets = 2,
        zorder = Some((Seq("ts", "score"), 16)), writerOptions = opts)
      DocStore.append(batch(k), "zdocs_plain", buckets = 2,
        writerOptions = opts)
    }
    // the declaration is recorded at creation and only there
    assert(ZOrderLayout.layoutOf(spark, "zdocs")
      .contains((Seq("ts", "score"), 16)))
    assert(ZOrderLayout.layoutOf(spark, "zdocs_plain").isEmpty)
    // (1) FINAL parity: same logical corpus, no __z anywhere
    def finalSet(t: String) = DocStore.readFinal(spark, t)
      .collect().map(_.toSeq).toSet
    assert(!DocStore.readFinal(spark, "zdocs").columns.contains("__z"))
    assert(finalSet("zdocs") == finalSet("zdocs_plain"),
      "z layout changed FINAL semantics")
    // (2) footer-measured pruning on a ~6-week time box x a 10% score
    // slice (ts files are TIMESTAMP_MICROS)
    def dirOf(t: String): String = {
      val f = spark.table(t).inputFiles.head
      new java.io.File(new java.net.URI(f)).getParent
    }
    val lo = (base + 100 * 86400L) * 1000000L
    val hi = (base + 142 * 86400L) * 1000000L
    val box = Map("ts" -> ((lo, hi)), "score" -> ((20000L, 30000L)))
    val zHit = ZOrderLayout.matchingRowGroups(dirOf("zdocs"), box)
    val pHit = ZOrderLayout.matchingRowGroups(dirOf("zdocs_plain"), box)
    assert(zHit._2 >= 8 && pHit._2 >= 8,
      s"need multiple row groups to measure: $zHit $pHit")
    info(s"doc-store box pruning: z=${zHit._1}/${zHit._2} " +
      s"plain=${pHit._1}/${pHit._2} row groups")
    assert(pHit._1 * 1L >= 4L * zHit._1.max(1),
      s"z pruning under 4x: z=$zHit plain=$pHit")
    // (3) the near-dup index is layout-independent: a re-delivered
    // copy of a stored doc is flagged identically by both stores
    val probe = batch(0).filter(col("doc_id") === 7L)
      .withColumn("doc_id", lit(999999L))
    def cand(t: String) = DocStore.nearDupCandidates(spark, t, probe)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand("zdocs") == Set((7L, 999999L)))
    assert(cand("zdocs") == cand("zdocs_plain"))
    // (4) the layout survives compact (corpus-global re-layout) and
    // appends keep honoring it without the caller re-passing it
    DocStore.compact(spark, "zdocs", buckets = 2, writerOptions = opts)
    assert(ZOrderLayout.layoutOf(spark, "zdocs")
      .contains((Seq("ts", "score"), 16)))
    assert(finalSet("zdocs") == finalSet("zdocs_plain"),
      "compact broke FINAL on the z doc store")
    val zHit2 = ZOrderLayout.matchingRowGroups(dirOf("zdocs"), box)
    assert(zHit2._1 * 4L <= zHit2._2,
      s"post-compact layout lost its pruning: $zHit2")
    // (5) point lookups still have an index on the z store: doc_id is
    // scattered by the z sort, so the id bloom is load-bearing
    import graft.sources.BloomSkip
    val absent = BloomSkip.skippableRowGroups(
      dirOf("zdocs"), "doc_id", 123456789L)
    assert(absent._1 * 100 >= absent._2 * 95,
      s"absent id should skip ~everything: $absent")
  }

  // GraphStore (r14): the summary-store fence applied to whole-graph
  // analytics — ranks/communities maintained at a refresh cadence and
  // SERVED from node-grain tables with the staleness VISIBLE. Gates:
  // served ≡ recompute at every refresh; appends change serves only at
  // refresh (as-of semantics, staleness reports the lag); a replayed
  // edge batch is absorbed structurally (the edge set is a SET); a
  // node takedown masks every serve immediately and refresh scrubs it
  // physically + retires the tombstones.
  test("graph store: served ≡ recompute, as-of staleness, replay immunity, takedown") {
    import spark.implicits._
    import graft.operators.PageRank
    import graft.sources.GraphStore
    Seq("gstore", "gstore_dels", "gstore_ranks", "gstore_communities",
      "gstore_cohesion", "gstore_kcore", "gstore_support")
      .foreach(dropTable)
    def rankMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("id"), col("r")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b1 = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")).toDF("src", "dst")
    GraphStore.append(b1, "gstore", ver = 1, buckets = 2)
    GraphStore.refresh(spark, "gstore", minSupport = 1L, buckets = 2,
      kcoreK = 2L)
    val served1 = rankMap(GraphStore.ranks(spark, "gstore"))
    assert(served1 == rankMap(PageRank.ranks(
      GraphStore.edges(spark, "gstore"))), "served rank != recompute")
    val comm1 = GraphStore.communities(spark, "gstore")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // the bridge c-x sits on no triangle: two truss communities
    assert(comm1 == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "x", "z" -> "x"), s"communities: $comm1")
    // cohesion is served from the same census: ≡ a perNode recompute
    def cohMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("node"), col("n_triangles")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cohMap(GraphStore.cohesion(spark, "gstore")) ==
      cohMap(graft.operators.Triangles
        .perNode(GraphStore.edges(spark, "gstore"))
        .select(col("node"), col("n_triangles"))),
      "served cohesion != census recompute")
    // k-core (r15): the fourth cohesion face, served ≡ a peel recompute
    def coreMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("node"), df.columns.filter(c => c == "core_degree"
        || c == "d").map(col).head).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(coreMap(GraphStore.kcore(spark, "gstore")) ==
      coreMap(graft.operators.KCore.membership(
        GraphStore.edges(spark, "gstore"), k = 2L, rounds = 10)),
      "served kcore != peel recompute")
    assert(coreMap(GraphStore.kcore(spark, "gstore")).nonEmpty)
    assert(GraphStore.staleness(spark, "gstore") == ((1L, 1L)))
    // appends change the EDGES immediately but serves only at refresh
    val b2 = Seq(("z", "w"), ("y", "w")).toDF("src", "dst")
    GraphStore.append(b2, "gstore", ver = 2, buckets = 2)
    assert(rankMap(GraphStore.ranks(spark, "gstore")) == served1,
      "serve moved before refresh")
    assert(GraphStore.staleness(spark, "gstore") == ((1L, 2L)))
    GraphStore.refresh(spark, "gstore", minSupport = 1L, buckets = 2,
      kcoreK = 2L)
    val served2 = rankMap(GraphStore.ranks(spark, "gstore"))
    assert(served2 == rankMap(PageRank.ranks(
      GraphStore.edges(spark, "gstore"))), "post-refresh serve != recompute")
    // this tick was APPEND-ONLY → the r15 DELTA census path ran (b2's
    // z-w/y-w edges close a NEW triangle (w,y,z) through the old y-z
    // edge); the patched support table and the cohesion derived from
    // it must equal from-scratch recomputes
    assert(spark.table("gstore_support")
      .select(col("a"), col("b"), col("support")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      graft.operators.Triangles.perEdge(GraphStore.edges(spark, "gstore"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      "delta-patched support != full census")
    assert(cohMap(GraphStore.cohesion(spark, "gstore")) ==
      cohMap(graft.operators.Triangles
        .perNode(GraphStore.edges(spark, "gstore"))
        .select(col("node"), col("n_triangles"))),
      "delta-tick cohesion != census recompute")
    // ... and the r15-continuation DELTA K-CORE path ran on the same
    // tick (stored k == kcoreK, no tombstones): w joins the 2-core
    // through the new w-y/w-z edges; the patched membership and
    // in-core degrees must equal a full peel
    assert(coreMap(GraphStore.kcore(spark, "gstore")) ==
      coreMap(graft.operators.KCore.membership(
        GraphStore.edges(spark, "gstore"), k = 2L, rounds = 10)),
      "delta-tick kcore != peel recompute")
    assert(coreMap(GraphStore.kcore(spark, "gstore")).contains("w"),
      "the joiner w must be served from the patched kcore")
    assert(served2.contains("w") && served2 != served1)
    assert(GraphStore.staleness(spark, "gstore") == ((2L, 2L)))
    // replayed batch: the edge set absorbs it structurally — the
    // refreshed ranks are bit-identical
    GraphStore.append(b2, "gstore", ver = 3, buckets = 2)
    assert(GraphStore.edges(spark, "gstore").count() == 9)
    GraphStore.refresh(spark, "gstore", minSupport = 1L, buckets = 2,
      kcoreK = 2L)
    assert(rankMap(GraphStore.ranks(spark, "gstore")) == served2,
      "replayed batch moved the rank vector")
    assert(coreMap(GraphStore.kcore(spark, "gstore")) ==
      coreMap(graft.operators.KCore.membership(
        GraphStore.edges(spark, "gstore"), k = 2L, rounds = 10)),
      "replayed batch moved the kcore membership")
    // takedown: the popped node vanishes from EVERY face immediately
    // (edges, ranks, communities — even though the snapshots predate
    // the pop), refresh scrubs physically and retires the tombstones
    GraphStore.pop(spark, "gstore", Seq("x").toDF("id"))
    assert(!GraphStore.edges(spark, "gstore").collect()
      .exists(r => r.getString(0) == "x" || r.getString(1) == "x"))
    assert(!GraphStore.ranks(spark, "gstore").collect()
      .exists(_.getString(0) == "x"))
    assert(!GraphStore.communities(spark, "gstore").collect()
      .exists(_.getString(0) == "x"))
    assert(!GraphStore.cohesion(spark, "gstore").collect()
      .exists(_.getString(0) == "x"))
    assert(!GraphStore.kcore(spark, "gstore").collect()
      .exists(_.getString(0) == "x"))
    GraphStore.refresh(spark, "gstore", minSupport = 1L, buckets = 2,
      kcoreK = 2L)
    assert(!spark.catalog.tableExists("gstore_dels"),
      "tombstones must retire at refresh")
    val served3 = rankMap(GraphStore.ranks(spark, "gstore"))
    assert(!served3.contains("x"))
    assert(served3 == rankMap(PageRank.ranks(
      GraphStore.edges(spark, "gstore"))), "post-pop serve != recompute")
    assert(coreMap(GraphStore.kcore(spark, "gstore")) ==
      coreMap(graft.operators.KCore.membership(
        GraphStore.edges(spark, "gstore"), k = 2L, rounds = 10)),
      "post-pop served kcore != peel recompute")
  }

  // Decoupled compaction (r15 continuation): an append-only tick
  // computes summaries WITHOUT rewriting a single edge file; compact()
  // is the explicit corpus-rewrite face and preserves each edge's
  // FIRST-SEEN ver (the invariant that keeps the delta splits exact
  // across rewrites); no-op and pure-replay ticks short-circuit before
  // any iteration round; a parameter change defeats the fast paths;
  // and a standalone compact with a pending takedown scrubs physically
  // but NEVER retires the tombstone (no resurrection window).
  test("graph store: decoupled compaction — file-stable ticks, replay/no-op fast paths, first-seen vers, scrub-never-retires") {
    import spark.implicits._
    import graft.operators.PageRank
    import graft.sources.GraphStore
    val t = "gstore2"
    Seq(t, s"${t}_dels", s"${t}_ranks", s"${t}_communities",
      s"${t}_cohesion", s"${t}_kcore", s"${t}_support").foreach(dropTable)
    def rankMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("id"), col("r")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    def supportAsOf(): Long = spark.table(s"${t}_support")
      .agg(max(col("as_of"))).collect()(0).getLong(0)
    val b1 = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "x"))
      .toDF("src", "dst")
    GraphStore.append(b1, t, ver = 1, buckets = 2)
    val edgeFiles1 = spark.table(t).inputFiles.toSet
    GraphStore.refresh(spark, t, minSupport = 1L, buckets = 2,
      kcoreK = 2L, compactEdges = false)
    assert(spark.table(t).inputFiles.toSet == edgeFiles1,
      "a summary tick must not rewrite edge files")
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t))),
      "tick serve != recompute")
    assert(GraphStore.staleness(spark, t) == ((1L, 1L)))
    // NO-OP tick: nothing changed — summaries untouched too
    val rankFiles1 = spark.table(s"${t}_ranks").inputFiles.toSet
    GraphStore.refresh(spark, t, minSupport = 1L, buckets = 2,
      kcoreK = 2L, compactEdges = false)
    assert(spark.table(s"${t}_ranks").inputFiles.toSet == rankFiles1,
      "a no-op tick must not rewrite the summaries")
    // PURE-REPLAY tick: a batch lands but every edge already exists —
    // as_of catches up with no iteration rounds; the edge-grain
    // support table keeps its own snapshot stamp
    GraphStore.append(b1, t, ver = 2, buckets = 2)
    val sAsOf1 = supportAsOf()
    GraphStore.refresh(spark, t, minSupport = 1L, buckets = 2,
      kcoreK = 2L, compactEdges = false)
    assert(GraphStore.staleness(spark, t) == ((2L, 2L)),
      "a replay tick must catch the as_of up")
    assert(supportAsOf() == sAsOf1,
      "a replay tick must not rewrite the edge-grain support table")
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t))),
      "replay-tick serve != recompute")
    // a REAL batch takes the normal delta tick (support restamped)
    val b2 = Seq(("x", "y"), ("y", "z"), ("x", "z")).toDF("src", "dst")
    GraphStore.append(b2, t, ver = 3, buckets = 2)
    GraphStore.refresh(spark, t, minSupport = 1L, buckets = 2,
      kcoreK = 2L, compactEdges = false)
    assert(supportAsOf() == 3L)
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t))),
      "delta-tick serve != recompute")
    // physical rows accumulated (b1 twice + b2); compact collapses
    // them, PRESERVES first-seen vers, keeps the watermark monotone
    assert(spark.table(t).count() == 11)
    GraphStore.compact(spark, t)
    assert(spark.table(t).count() == 7,
      "compact must collapse duplicate rows")
    val vers = spark.table(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(vers(("a", "b")) == 1L && vers(("x", "y")) == 3L,
      s"first-seen vers must survive compaction: $vers")
    assert(GraphStore.staleness(spark, t) == ((3L, 3L)),
      "the compact watermark must keep maxVer monotone")
    // the delta paths survive the rewrite: a post-compact batch still
    // ticks delta and equals the from-scratch recomputes
    val b3 = Seq(("z", "w"), ("y", "w")).toDF("src", "dst")
    GraphStore.append(b3, t, ver = 4, buckets = 2)
    GraphStore.refresh(spark, t, minSupport = 1L, buckets = 2,
      kcoreK = 2L, compactEdges = false)
    assert(spark.table(s"${t}_support")
      .select(col("a"), col("b"), col("support")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      graft.operators.Triangles.perEdge(GraphStore.edges(spark, t))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      "post-compact delta support != full census")
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t))))
    // a parameter change defeats the replay fast path: replayed batch
    // + different iters must RECOMPUTE at the new params, not restamp
    GraphStore.append(b3, t, ver = 5, buckets = 2)
    GraphStore.refresh(spark, t, iters = 5, minSupport = 1L,
      buckets = 2, kcoreK = 2L, compactEdges = false)
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t), iters = 5)),
      "a changed-params tick must recompute at the new params")
    // standalone compact with a pending takedown: scrubs physically,
    // NEVER retires (a stale rank table must stay masked); the next
    // COMPACTING refresh retires, and the scrub marker forces it full
    GraphStore.pop(spark, t, Seq("x").toDF("id"))
    GraphStore.compact(spark, t)
    assert(!spark.table(t).collect()
      .exists(r => r.getString(0) == "x" || r.getString(1) == "x"),
      "compact must scrub popped edges physically")
    assert(spark.catalog.tableExists(s"${t}_dels"),
      "standalone compact must not retire tombstones")
    assert(!GraphStore.ranks(spark, t).collect()
      .exists(_.getString(0) == "x"), "popped node must stay masked")
    GraphStore.refresh(spark, t, iters = 5, minSupport = 1L,
      buckets = 2, kcoreK = 2L)
    assert(!spark.catalog.tableExists(s"${t}_dels"),
      "the compacting refresh must retire the tombstones")
    assert(rankMap(GraphStore.ranks(spark, t)) ==
      rankMap(PageRank.ranks(GraphStore.edges(spark, t), iters = 5)),
      "post-scrub full tick serve != recompute")
    assert(spark.table(s"${t}_support")
      .select(col("a"), col("b"), col("support")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap ==
      graft.operators.Triangles.perEdge(GraphStore.edges(spark, t))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap,
      "post-scrub support != full census")
  }
}
