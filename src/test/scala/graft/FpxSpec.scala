package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Fpx

/** Specs for the multi-algorithm fpx feed (engine.py:162-180,
  * statements.py:44-48) and phonetic blocking.
  */
class FpxSpec extends AnyFunSuite {
  import SparkTestSession._

  private def stmts(rows: (String, String)*) = {
    import spark.implicits._
    rows.toSeq.toDF("entity_id", "value")
      .select(col("entity_id"), col("entity_id").as("canonical_id"),
        lit("LegalEntity").as("schema"), lit("ds").as("dataset"),
        lit("name").as("prop"), lit("name").as("prop_type"), col("value"))
  }

  test("fpx feed emits all four algorithms with exact values") {
    val fpx = Fpx.fromStatements(stmts("e1" -> "Tchibo Holding AG"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSet
    // blocking tokens: full fingerprint + every token >5 chars
    // (phonetic.py:32-37) — here "holding" and "tchibo"
    val tokens = Seq("ag holding tchibo", "holding", "tchibo")
    val expected = tokens.flatMap { t =>
      val (m1, m2) = DoubleMetaphoneVectors.of(t)
      Seq(("fingerprint", t), ("metaphone1", m1), ("metaphone2", m2),
        ("soundex", t match {
          case "ag holding tchibo" => "A243"
          case "holding" => "H435"
          case "tchibo" => "T210"
        }))
    }.filter(_._2.nonEmpty).toSet
    assert(fpx == expected)
  }

  test("fpx per-algorithm row counts: m2 only where an alternate exists") {
    val in = stmts("e1" -> "Smith", "e2" -> "Schmidt", "e3" -> "Otto")
    val counts = Fpx.fromStatements(in)
      .groupBy("algorithm").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // one token per name ("smith"/"schmidt"/"otto"; none >5 chars besides
    // the full fp which equals the token)
    assert(counts("fingerprint") == 3)
    assert(counts("metaphone1") == 3)
    assert(counts("soundex") == 3)
    // smith (SM0/XMT) and schmidt (XMT/SMT) have alternates; otto does not
    assert(counts("metaphone2") == 2)
  }

  test("algorithm subset skips phonetic branches; invalid rejected") {
    val in = stmts("e1" -> "Smith")
    val only = Fpx.fromStatements(in, algorithms = Seq("fingerprint"))
    assert(only.select("algorithm").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("fingerprint"))
    assertThrows[IllegalArgumentException] {
      Fpx.fromStatements(in, algorithms = Seq("nope"))
    }
  }

  test("metaphone blocking pairs entities fingerprint blocking misses") {
    // smith/schmidt: different fingerprints, same metaphone code family
    val in = stmts("e1" -> "Smith", "e2" -> "Schmidt", "e3" -> "Jones")
    val fpx = Fpx.fromStatements(in)
    val fpPairs = Fpx.xrefBlocks(
      fpx.filter(col("algorithm") === "fingerprint"), minEntities = 2)
      .collect()
    assert(fpPairs.isEmpty)
    // metaphone1("smith") = SM0; metaphone2("schmidt") = SMT;
    // metaphone1("schmidt") = XMT = metaphone2("smith") → they share a
    // code when blocking across metaphone1+metaphone2 (the reference
    // runs the block query per algorithm over the same value space)
    val phonetic = Fpx.xrefBlocks(
      fpx.filter(col("algorithm").startsWith("metaphone")), minEntities = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(phonetic.contains(("e1", "e2")))
  }
}

/** Shared access to the Scala doublemetaphone for expected values —
  * keeps FpxSpec assertions tied to the spec'd encoder rather than
  * hand-copied strings.
  */
object DoubleMetaphoneVectors {
  def of(s: String): (String, String) =
    graft.functions.DoubleMetaphone.encode(s)
}
