package graft

import graft.graph.Sssp
import org.scalatest.funsuite.AnyFunSuite

/** Sssp: hand graph where the cheapest path needs MORE hops (the case
  * plain BFS gets wrong), the hop bound excluding a cheaper-but-longer
  * path, parallel-edge min collapse, negative-weight loud failure, and
  * exact agreement with a driver DP reference on a seeded graph. */
class SsspSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Reference: dist_k(n) = min weight over paths of ≤ k edges (the
    * textbook Bellman–Ford DP, no pruning). */
  private def reference(edges: Seq[(Long, Long, Long)], sources: Seq[Long],
                        maxHops: Int): Map[(Long, Long), Long] = {
    val e = edges.groupBy(x => (x._1, x._2)).map { case (k, v) => (k._1, k._2, v.map(_._3).min) }
    sources.flatMap { s =>
      var best = Map((s, s) -> 0L)
      for (_ <- 1 to maxHops) {
        val relax = for {
          ((src, u), d) <- best.toSeq if src == s
          (a, b, w) <- e if a == u
        } yield (s, b) -> (d + w)
        best = (best.toSeq ++ relax).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).min }
      }
      best
    }.toMap
  }

  private def run(edges: Seq[(Long, Long, Long)], sources: Seq[Long], maxHops: Int) =
    Sssp.boundedDistances(edges.toDF("s", "t", "w"), "s", "t", "w", sources, maxHops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cheapest path uses more hops than the direct edge") {
    // 1 -> 4 direct costs 100; 1 -> 2 -> 3 -> 4 costs 3
    val e = Seq((1L, 4L, 100L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L))
    assert(run(e, Seq(1L), 10)((1L, 4L)) == 3L)
    // with maxHops = 1 only the direct edge is in budget
    assert(run(e, Seq(1L), 1)((1L, 4L)) == 100L)
    // maxHops = 2: 1->2->3 reachable, 3-hop path to 4 still out of budget
    val h2 = run(e, Seq(1L), 2)
    assert(h2((1L, 4L)) == 100L && h2((1L, 3L)) == 2L)
  }

  test("a LATER cheaper arrival still propagates within the hop budget") {
    // to node 9: 2 hops at cost 10, or 4 hops at cost 4; beyond 9 one
    // more edge — at maxHops=5 the 4-hop cheap path must reach 10
    val e = Seq((1L, 8L, 5L), (8L, 9L, 5L),
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 9L, 1L),
      (9L, 10L, 1L))
    val got = run(e, Seq(1L), 5)
    val want = reference(e, Seq(1L), 5)
    assert(got == want)
    assert(got((1L, 9L)) == 4L && got((1L, 10L)) == 5L)
    // at maxHops=3 only the expensive 2-hop arrival is in budget
    assert(run(e, Seq(1L), 3)((1L, 9L)) == 10L)
  }

  test("parallel edges collapse to min weight; (src,src,0) included") {
    val e = Seq((1L, 2L, 7L), (1L, 2L, 3L), (1L, 2L, 9L))
    val got = run(e, Seq(1L), 4)
    assert(got == Map((1L, 1L) -> 0L, (1L, 2L) -> 3L))
  }

  test("negative weights fail loudly") {
    val e = Seq((1L, 2L, -1L))
    val ex = intercept[IllegalArgumentException] { run(e, Seq(1L), 3) }
    assert(ex.getMessage.contains("negative edge weight"))
  }

  test("seeded random graph matches the DP reference exactly (multi-source)") {
    val rnd = new scala.util.Random(23L)
    val n = 60
    val e = (0 until 400).map { _ =>
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, (1 + rnd.nextInt(20)).toLong)
    }
    val sources = Seq(0L, 7L, 13L)
    for (h <- Seq(0, 1, 4)) {
      val got = run(e, sources, h)
      val want = reference(e, sources, h)
      assert(got == want, s"maxHops=$h")
    }
    // partition invariance at h=4
    val df = e.toDF("s", "t", "w").repartition(13)
    val again = Sssp.boundedDistances(df, "s", "t", "w", sources, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == run(e, sources, 4))
  }
}
