package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MetaphoneExpression, Phonetics}

/** Specs for the phonetic/normalization functions, including the
  * native Catalyst metaphone expression (codegen path + SQL
  * registration).
  */
class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("fingerprint matches the reference test vector") {
    // /root/reference/tests/test_store.py:55
    import spark.implicits._
    val out = Seq("Tchibo Holding AG").toDF("name")
      .select(Phonetics.fingerprint(col("name"))).collect()(0).getString(0)
    assert(out == "ag holding tchibo")
  }

  test("soundex tokens: classic examples") {
    import spark.implicits._
    val out = Seq("robert rupert ashcraft").toDF("fp")
      .select(Phonetics.soundexTokens(col("fp"))).collect()(0)
      .getSeq[String](0)
    assert(out == Seq("R163", "R163", "A261")) // Spark soundex variant
  }

  test("metaphone scala impl: deterministic canonical vectors") {
    // classic-metaphone rules as implemented: TH→0, initial KN→N,
    // CH→X, initial X→S
    assert(Phonetics.metaphone("thompson") == "0MPSN")
    assert(Phonetics.metaphone("knight") == "NT")
    assert(Phonetics.metaphone("school") == "SXL")
    assert(Phonetics.metaphone("xavier") == "SFR")
    assert(Phonetics.metaphone("") == "")
  }

  test("native expression == UDF on real part names (codegen path)") {
    import spark.implicits._
    val toks = Tables.load(spark, sf, "part")
      .select(explode(split(Phonetics.fingerprint(col("p_name")), " "))
        .as("tok"))
    val diff = toks
      .select(col("tok"),
        MetaphoneExpression.metaphone(col("tok")).as("native"),
        Phonetics.metaphoneUdf(col("tok")).as("viaUdf"))
      .filter(col("native") =!= col("viaUdf"))
    assert(diff.count() == 0)
  }

  test("native expression handles nulls and registers as SQL function") {
    import spark.implicits._
    val n = Seq(Option.empty[String]).toDF("s")
      .select(MetaphoneExpression.metaphone(col("s"))).collect()(0)
    assert(n.isNullAt(0))
    MetaphoneExpression.register(spark)
    val viaSql = spark.sql("SELECT graft_metaphone('Tchibo')").collect()(0)
    assert(viaSql.getString(0) == Phonetics.metaphone("Tchibo"))
  }
}
