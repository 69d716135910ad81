package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.model.Statements
import graft.operators.EntityQuery

/** Specs for the map-shaped entity assembly, approx stats, and the
  * EntityQuery point filters.
  */
class ModelSpec extends AnyFunSuite {
  import SparkTestSession._

  private def stmts = {
    import spark.implicits._
    Seq(
      ("e1", "e1", "Person", "ds", "name", "name", "Alice"),
      ("e1", "e1", "Person", "ds", "name", "name", "Ally"),
      ("e1", "e1", "Person", "ds", "country", "string", "de"),
      ("e2", "e2", "Person", "ds", "name", "name", "Bob"))
      .toDF("entity_id", "canonical_id", "schema", "dataset", "prop",
        "prop_type", "value")
  }

  test("assembleMap groups multi-valued props into sorted arrays") {
    val e1 = Statements.assembleMap(stmts)
      .filter(col("canonical_id") === "e1").collect()(0)
    val props = e1.getMap[String, scala.collection.Seq[String]](3)
    assert(props("name").toSeq == Seq("Alice", "Ally"))
    assert(props("country").toSeq == Seq("de"))
    assert(e1.getLong(4) == 3)
  }

  test("statsApprox approximates exact stats within tolerance") {
    // columns: dataset, schema, entities, statements
    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
    val exact = Statements.stats(Queries.statements(spark, sf)).collect()
      .map(r => key(r) -> (r.getLong(2), r.getLong(3))).toMap
    Statements.statsApprox(Queries.statements(spark, sf)).collect()
      .foreach { r =>
        val (ents, stmtsTruth) = exact(key(r))
        assert(r.getLong(3) == stmtsTruth, "statement counts are exact")
        val rel = math.abs(r.getLong(2).toDouble - ents) / ents.toDouble
        assert(rel < 0.1, s"${key(r)}: est ${r.getLong(2)} vs $ents")
      }
  }

  test("EntityQuery point filters restrict to one entity") {
    val out = EntityQuery(stmts).canonicalId("e1").entities().collect()
    assert(out.map(_.getString(0)).toSeq == Seq("e1"))
    val out2 = EntityQuery(stmts).entityId("e2").entities().collect()
    assert(out2.map(_.getString(0)).toSeq == Seq("e2"))
  }
}
