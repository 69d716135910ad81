package graft

import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-corpus robustness net: EVERY registry query must plan
  * and execute against an empty catalog and a single-row catalog
  * without throwing. At 100 TB these shapes are routine — a dataset
  * filter that matches nothing, a brand-new dataset with one document,
  * an empty partition after pruning — and operators with hidden
  * head-of-empty / aggregate-of-empty / seed-selection assumptions
  * fail exactly here, not on the happy-path scale factors the oracle
  * gate exercises.
  *
  * Row counts are NOT asserted (a global aggregate legitimately emits
  * its one summary row on empty input); the invariant is "no query
  * throws on degenerate input".
  */
class DegenerateCorpusSpec extends AnyFunSuite {
  import SparkTestSession._

  private def catalog(rows: Int): String = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_degenerate_$rows").toString
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings"))
      Tables.load(spark, sf, t).limit(rows).write.mode("overwrite")
        .parquet(s"$dir/$t.parquet")
    dir
  }

  private lazy val emptyDir = catalog(0)
  private lazy val oneRowDir = catalog(1)

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs on an empty catalog") {
      fn(spark, emptyDir).count() // must not throw
    }
    test(s"$name runs on a single-row catalog") {
      fn(spark, oneRowDir).count() // must not throw
    }
  }
}
