package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** Salting preserves semantics: salted forms must equal their plain
  * counterparts exactly.
  */
class SkewSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join == plain join") {
    import spark.implicits._
    val big = Seq.tabulate(100)(i => (i % 3, s"row$i")).toDF("k", "payload")
    val small = Seq((0, "a"), (1, "b"), (2, "c"), (7, "never")).toDF("k", "v")
    val plain = big.join(small, Seq("k")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2))).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("two-phase agg == direct agg") {
    import spark.implicits._
    val df = Seq.tabulate(1000)(i => (i % 5, i.toLong)).toDF("k", "v")
    val direct = df.groupBy($"k").agg(sum($"v").as("v")).collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted
    val twoPhase = Skew.twoPhaseAgg(df, $"k", salts = 16,
      partial = sum, merge = sum, valueCol = "v").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(twoPhase.toSeq == direct.toSeq)
  }
}
