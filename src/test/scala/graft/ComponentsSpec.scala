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

  // ---- Traverse.khop (f22) ----

  private def hopsOf(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("khop == brute-force BFS distances on a randomized graph") {
    import graft.operators.Traverse
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = Seq.fill(140)((rnd.nextInt(n).toString, rnd.nextInt(n).toString))
    val seeds = Seq("0", "1")
    // reference BFS over the symmetrized adjacency
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (h <- 1 to 3) {
      val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
        .diff(dist.keySet)
      dist ++= next.map(_ -> h)
      frontier = next
    }
    val got = hopsOf(Traverse.khop(
      edges.toDF("src", "dst"), seeds.toDF("id"), maxHops = 3))
    assert(got == dist,
      s"mismatch: extra=${got.toSet -- dist.toSet} missing=${dist.toSet -- got.toSet}")
  }

  test("shortestPathMembers == brute-force meet-in-the-middle on a randomized graph") {
    import graft.operators.Traverse
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = Seq.fill(70)((rnd.nextInt(n).toString, rnd.nextInt(n).toString))
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    def bfs(seeds: Set[String], maxH: Int): Map[String, Int] = {
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds
      for (h <- 1 to maxH) {
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty))
          .diff(dist.keySet)
        dist ++= next.map(_ -> h)
        frontier = next
      }
      dist
    }
    val (sa, sb) = (Set("0"), Set("1", "2"))
    val da = bfs(sa, 3); val db = bfs(sb, 3)
    val common = da.keySet intersect db.keySet
    val want: Set[(String, Long, Long, Long)] =
      if (common.isEmpty) Set.empty
      else {
        val d = common.map(v => da(v) + db(v)).min
        common.filter(v => da(v) + db(v) == d)
          .map(v => (v, da(v).toLong, db(v).toLong, d.toLong))
      }
    val got = Traverse.shortestPathMembers(
      edges.toDF("src", "dst"), sa.toSeq.toDF("id"), sb.toSeq.toDF("id"),
      maxHops = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want)
    // disconnected seed sets → empty, not an error
    val far = Traverse.shortestPathMembers(
      Seq(("a", "b"), ("x", "y")).toDF("src", "dst"),
      Seq("a").toDF("id"), Seq("x").toDF("id"), maxHops = 5)
    assert(far.isEmpty)
    // coverage contract (documented): a line of length 8 with
    // maxHops = 4 yields the MIDDLE SLICE — only the midpoint has
    // both distances within budget — while dist stays exact; at
    // maxHops >= dist the DAG is complete
    val line = (0 until 8).map(i => (s"n$i", s"n${i + 1}")).toDF("src", "dst")
    val mid = Traverse.shortestPathMembers(
      line, Seq("n0").toDF("id"), Seq("n8").toDF("id"), maxHops = 4)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSet
    assert(mid == Set(("n4", 8L)), s"middle slice: $mid")
    val full = Traverse.shortestPathMembers(
      line, Seq("n0").toDF("id"), Seq("n8").toDF("id"), maxHops = 8)
    assert(full.count() == 9L, "maxHops >= dist returns the whole path")
  }

  test("khop edge semantics: maxHops=0, absent seeds, unreachable region") {
    import graft.operators.Traverse
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    // maxHops=0 → exactly the seed set at hop 0, even seeds the edge
    // list never mentions
    val zero = hopsOf(Traverse.khop(edges, Seq("a", "ghost").toDF("id"), 0))
    assert(zero == Map("a" -> 0, "ghost" -> 0))
    // the x-y component is unreachable from a at any depth; c is found
    // at its minimal depth 2 even though maxHops allows 5
    val got = hopsOf(Traverse.khop(edges, Seq("a").toDF("id"), 5))
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2))
  }
}
