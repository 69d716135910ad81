package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI spec: ingest JSONL → stats → query → optimize. */
class CliSpec extends AnyFunSuite {
  import SparkTestSession._

  test("cli: ingest, stats, query, optimize round-trip") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS cli_spec")
    val dir = new java.io.File("/tmp/graft_warehouse/cli_spec")
    if (dir.exists()) {
      dir.listFiles().foreach { f =>
        if (f.isDirectory) f.listFiles().foreach(_.delete())
        f.delete()
      }
      dir.delete()
    }
    val entities = Seq(
      ("p1", "Person", Seq("ds"), Map("name" -> Seq("Ann"), "amount" -> Seq("500"))),
      ("p2", "Person", Seq("ds"), Map("name" -> Seq("Bob"), "amount" -> Seq("100"))))
      .toDF("id", "schema", "datasets", "properties")
    graft.sources.FtmJson.writeEntities(entities, "/tmp/graft_cli_in")

    Cli.run(spark, List("ingest", "cli_spec", "/tmp/graft_cli_in"))
    // duplicate delivery at a later timestamp — optimize must collapse it
    Cli.run(spark, List("ingest", "cli_spec", "/tmp/graft_cli_in",
      "2026-02-01 00:00:00"))
    assert(spark.table("cli_spec").count() == 8)

    Cli.run(spark, List("optimize", "cli_spec"))
    assert(spark.table("cli_spec").count() == 4)

    val q = graft.operators.EntityQuery(
      graft.sources.StatementStore.readFinal(spark, "cli_spec"))
      .dataset("ds").where("amount", "gte", "200").entities().collect()
    assert(q.map(_.getString(0)).toSeq == Seq("p1"))
  }
}
