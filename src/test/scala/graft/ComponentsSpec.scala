package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected-components engine specs: the two algorithms must agree,
  * and the star algorithm must solve the high-diameter graphs the
  * propagation algorithm (correctly) refuses.
  */
class ComponentsSpec extends AnyFunSuite {
  import SparkTestSession._

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("minLabelStars == minLabel on a mixed graph (cliques, chains, self-loop)") {
    import spark.implicits._
    // clique 1-2-3-4, chain 10-11-12-13, pair 20-21, isolated self-loop 30
    val edges = (for {
      a <- Seq(1L, 2L, 3L, 4L); b <- Seq(1L, 2L, 3L, 4L) if a < b
    } yield (a, b)) ++
      Seq((10L, 11L), (11L, 12L), (12L, 13L), (20L, 21L), (30L, 30L))
    val df = edges.toDF("src", "dst")
    val prop = labelsOf(Components.minLabel(df))
    val stars = labelsOf(Components.minLabelStars(df))
    assert(stars == prop)
    assert(stars(4L) == 1L && stars(13L) == 10L && stars(30L) == 30L)
  }

  test("minLabelStars solves a diameter-60 path where minLabel throws at maxIter=50") {
    import spark.implicits._
    // pairwise-merge judgement chain: 0-1, 1-2, ..., 59-60
    val path = (0L until 60L).map(i => (i, i + 1)).toDF("src", "dst")
    assertThrows[IllegalStateException] {
      Components.minLabel(path, maxIter = 50).count()
    }
    val stars = labelsOf(Components.minLabelStars(path))
    assert(stars.size == 61 && stars.values.forall(_ == 0L))
  }
}
