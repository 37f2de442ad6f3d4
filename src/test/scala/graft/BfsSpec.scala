package graft

import graft.graph.Bfs
import org.scalatest.funsuite.AnyFunSuite

/** Bfs.multiSourceHops: hand-checked distances on chain/cycle/diamond,
  * directedness, maxHops truncation, duplicate-edge tolerance,
  * partition invariance. */
class BfsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], sources: Seq[Long], maxHops: Int,
                  parts: Int = 1): Map[(Long, Long), Int] =
    Bfs.multiSourceHops(edges.toDF("s", "t").repartition(parts), "s", "t",
        sources, maxHops)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap

  test("chain + branch: exact hop distances, source at 0") {
    // 1→2→3→4, 2→5
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 4L), (2L, 5L)), Seq(1L), 10)
    assert(got == Map((1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2,
      (1L, 4L) -> 3, (1L, 5L) -> 2))
  }

  test("cycle terminates and keeps the MIN hop; directed edges are one-way") {
    // 1→2→3→1 cycle plus 3→4; reverse reach from 2 to 1 is 2 hops
    val got = run(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)), Seq(1L, 2L), 10)
    assert(got((1L, 1L)) == 0 && got((1L, 2L)) == 1 && got((1L, 3L)) == 2)
    assert(got((2L, 1L)) == 2) // 2→3→1, never 1 hop (no reverse edge)
    assert(got((2L, 4L)) == 2 && got((1L, 4L)) == 3)
  }

  test("maxHops truncates: nodes past the horizon are absent") {
    val chain = (1L to 6L).sliding(2).map(p => (p(0), p(1))).toSeq
    val got = run(chain, Seq(1L), 2)
    assert(got == Map((1L, 1L) -> 0, (1L, 2L) -> 1, (1L, 3L) -> 2))
  }

  test("shorter path wins when a longer one arrives first; duplicate edges tolerated") {
    // diamond 1→2→4, 1→3→4 plus shortcut 1→4, with duplicated rows
    val edges = Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L), (1L, 4L), (1L, 4L), (1L, 2L))
    val got = run(edges, Seq(1L), 10)
    assert(got((1L, 4L)) == 1)
  }

  test("multi-source independence and partition invariance") {
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 3L), (3L, 6L))
    val a = run(edges, Seq(1L, 5L), 10, parts = 1)
    val b = run(edges, Seq(1L, 5L), 10, parts = 7)
    assert(a == b)
    assert(a((5L, 3L)) == 1 && a((1L, 3L)) == 2 && a((5L, 6L)) == 2)
    assert(!a.contains((5L, 2L)))
  }

  test("closeness: integer landmark rollup, self-only node gets 0") {
    // 1→2→3, 5→3: landmarks {1, 5}; node 3 reached by both (2 + 1),
    // node 2 only by 1 (dist 1), node 1/5 self-only (sum 0)
    val d = Bfs.multiSourceHops(
      Seq((1L, 2L), (2L, 3L), (5L, 3L)).toDF("s", "t"), "s", "t", Seq(1L, 5L), 10)
    val got = Bfs.closeness(d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(3L) == ((2L, 3L, 666666L))) // (1e6 * 2) div 3
    assert(got(2L) == ((1L, 1L, 1000000L)))
    assert(got(1L) == ((1L, 0L, 0L)) && got(5L) == ((1L, 0L, 0L)))
  }
}
