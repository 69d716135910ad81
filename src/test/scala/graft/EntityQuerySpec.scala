package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Adjacency, EntityQuery}

/** Specs for the fluent ftmq-style query surface (f12-f15). */
class EntityQuerySpec extends AnyFunSuite {
  import SparkTestSession._

  private def stmts = {
    import spark.implicits._
    Seq(
      // (entity, canonical, schema, dataset, prop, prop_type, value)
      ("e1", "e1", "Person", "ds", "name", "name", "Alice Smith"),
      ("e1", "e1", "Person", "ds", "country", "string", "de"),
      ("e1", "e1", "Person", "ds", "amount", "number", "300"),
      ("e2", "e2", "Person", "ds", "name", "name", "Bob Jones"),
      ("e2", "e2", "Person", "ds", "country", "string", "fr"),
      ("e2", "e2", "Person", "ds", "amount", "number", "500"),
      ("e3", "e3", "Company", "ds", "name", "name", "Acme Agency"),
      ("e3", "e3", "Company", "ds", "owner", "entity", "e1"))
      .toDF("entity_id", "canonical_id", "schema", "dataset", "prop",
        "prop_type", "value")
  }

  test("where clauses AND; comparators filter entities not statements") {
    val out = EntityQuery(stmts).schema("Person")
      .where("country", "in", "de", "fr")
      .where("amount", "gte", "400")
      .entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e2"))
    // the assembled entity still carries ALL props of e2
    assert(out(0).getString(3).contains("name=Bob Jones"))
  }

  test("search matches any value, case-insensitive") {
    val out = EntityQuery(stmts).search("AGENCY").entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e3"))
  }

  test("orderByProp desc with slice") {
    val out = EntityQuery(stmts).schema("Person")
      .orderByProp("amount", desc = true).slice(0, 1).entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e2"))
  }

  test("statementsOut returns raw statements of the selection") {
    val out = EntityQuery(stmts).schema("Person")
      .where("country", "eq", "de").statementsOut().collect()
    assert(out.length == 3) // all of e1's statements
    assert(out.forall(_.getString(0) == "e1"))
  }

  test("aggregateProp sums over the selected entity set") {
    val out = EntityQuery(stmts).schema("Person")
      .aggregateProp("sum", "amount").collect()
    assert(out.length == 1 && out(0).getDouble(1) == 800.0)
  }

  test("reverse lookup composes with schema and prop clauses") {
    // e3 (Company) has owner -> e1, so reverse(e1) selects e3
    val out = EntityQuery(stmts).reverse("e1").entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e3"))
    val none = EntityQuery(stmts).schema("Person").reverse("e1")
      .entities().collect()
    assert(none.isEmpty)
  }

  test("id prefix comparators (entity_id__startswith)") {
    val out = EntityQuery(stmts).entityId("e", "startswith")
      .where("country", "eq", "fr").entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e2"))
  }

  test("query-scoped stats") {
    val st = EntityQuery(stmts).schema("Person").stats().collect()(0)
    // dataset, schema, entities, statements
    assert(st.getString(1) == "Person")
    assert(st.getLong(2) == 2 && st.getLong(3) == 6)
  }

  test("multiple aggregates in one pass") {
    val r = EntityQuery(stmts).schema("Person")
      .aggregateProps(Seq(("max", "amount"), ("min", "amount"),
        ("count", "amount"))).collect()(0)
    assert(r.getDouble(0) == 500.0)
    assert(r.getDouble(1) == 300.0)
    assert(r.getDouble(2) == 2.0)
  }

  test("xref judgements: latest ts wins per pair") {
    import spark.implicits._
    import java.sql.Timestamp
    val xref = Seq(
      ("a", "b", "no_judgement", 0.5, Timestamp.valueOf("2026-01-01 00:00:00")),
      ("a", "b", "positive", 0.9, Timestamp.valueOf("2026-02-01 00:00:00")),
      ("a", "c", "negative", 0.1, Timestamp.valueOf("2026-01-15 00:00:00")))
      .toDF("left_id", "right_id", "judgement", "score", "ts")
    val out = graft.operators.Fpx.latestJudgements(xref).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(("a", "b", "positive"), ("a", "c", "negative")))
  }

  test("adjacency emits both directions") {
    val out = Adjacency.adjacent(stmts, "Person").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
    assert(out == Set(("e1", "e3", "in"))) // e3's owner edge points at e1
    val outC = Adjacency.adjacent(stmts, "Company").collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3))).toSet
    assert(outC == Set(("e3", "e1", "out")))
  }
}
