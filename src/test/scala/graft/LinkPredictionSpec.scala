package graft

import graft.graph.LinkPrediction
import org.scalatest.funsuite.AnyFunSuite

class LinkPredictionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lp(edges: Seq[(String, String)], minCn: Long = 1L,
                 maxCenterDeg: Long = 10000L): Map[(String, String), (Long, Long)] =
    LinkPrediction.commonNeighbors(edges.toDF("u", "v"), minCn, maxCenterDeg)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("path a-b-c proposes (a,c) at full Jaccard") {
    assert(lp(Seq("a" -> "b", "b" -> "c")) ==
      Map(("a", "c") -> ((1L, 10000L))))
  }

  test("4-cycle proposes both diagonals with cn=2") {
    val m = lp(Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d"))
    assert(m == Map(("a", "c") -> ((2L, 10000L)), ("b", "d") -> ((2L, 10000L))))
  }

  test("triangle proposes nothing (every wedge closes an existing edge)") {
    assert(lp(Seq("a" -> "b", "b" -> "c", "a" -> "c")).isEmpty)
  }

  test("center-degree cap silences the hub") {
    val star = (1 to 5).map(i => "h" -> s"s$i")
    assert(lp(star, maxCenterDeg = 4).isEmpty)
    val open = lp(star, maxCenterDeg = 5)
    assert(open.size == 10 && open.values.forall(_ == ((1L, 10000L))))
  }

  test("cn counts only sub-cap centers; degrees and denominator stay full-graph") {
    // h is a deg-5 hub (over the cap of 2); c is a deg-2 center
    val g = Seq("h" -> "x", "h" -> "y", "c" -> "x", "c" -> "y",
      "h" -> "z1", "h" -> "z2", "h" -> "z3")
    val m = lp(g, minCn = 1, maxCenterDeg = 2)
    // (x,y): only through c (h capped) -> cn=1, degs 2+2
    // (c,h): through x and y -> cn=2, degs 2+5 (full-graph deg for h)
    assert(m == Map(
      ("x", "y") -> ((1L, 10000L / 3L)),
      ("c", "h") -> ((2L, 2L * 10000L / 5L))))
  }

  test("minCn prunes single-wedge pairs") {
    val m = lp(Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d"), minCn = 2)
    assert(m.keySet == Set(("a", "c"), ("b", "d")))
    assert(lp(Seq("a" -> "b", "b" -> "c"), minCn = 2).isEmpty)
  }

  private def ra(edges: Seq[(String, String)], minCn: Long = 1L,
                 maxCenterDeg: Long = 10000L): Map[(String, String), (Long, Long)] =
    LinkPrediction.resourceAllocation(edges.toDF("u", "v"), minCn, maxCenterDeg)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("RA weights each common neighbor by 10^6 div its degree") {
    // (a,c) through b: deg(b)=2 -> 500000
    assert(ra(Seq("a" -> "b", "b" -> "c")) == Map(("a", "c") -> ((1L, 500000L))))
    // 4-cycle diagonals: two deg-2 centers each -> 10^6
    assert(ra(Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d")).values.toSet ==
      Set((2L, 1000000L)))
  }

  test("RA demotes high-degree centers where cn treats them equally") {
    // (x,y) reachable through c (deg 2) and hub h (deg 4):
    // ra = 10^6/2 + 10^6/4 = 750000 with cn = 2
    val g = Seq("c" -> "x", "c" -> "y", "h" -> "x", "h" -> "y",
      "h" -> "z1", "h" -> "z2")
    assert(ra(g, minCn = 2)(("x", "y")) == ((2L, 750000L)))
  }

  test("RA honors the center cap and the existing-edge anti-join") {
    val g = Seq("c" -> "x", "c" -> "y", "h" -> "x", "h" -> "y",
      "h" -> "z1", "h" -> "z2")
    // cap 2 silences h: only c contributes
    assert(ra(g, maxCenterDeg = 2)(("x", "y")) == ((1L, 500000L)))
    // a triangle proposes nothing
    assert(ra(Seq("a" -> "b", "b" -> "c", "a" -> "c")).isEmpty)
  }
}
