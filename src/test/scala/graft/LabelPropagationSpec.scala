package graft

import graft.graph.LabelPropagation
import org.scalatest.funsuite.AnyFunSuite

class LabelPropagationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def lpa(edges: Seq[(String, String)], iters: Int): Map[String, String] =
    LabelPropagation.run(edges.toDF("a", "b"), "a", "b", iters)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap

  test("triangle collapses to one community in two rounds") {
    val g = Seq("a" -> "b", "b" -> "c", "a" -> "c")
    // round 1: all-distinct neighbor labels tie -> smallest
    assert(lpa(g, 1) == Map("a" -> "b", "b" -> "a", "c" -> "a"))
    assert(lpa(g, 2).values.toSet == Set("a"))
  }

  test("two triangles with a bridge: hand-stepped rounds, two communities survive") {
    val g = Seq("a" -> "b", "b" -> "c", "a" -> "c",
      "x" -> "y", "y" -> "z", "x" -> "z", "c" -> "x")
    assert(lpa(g, 1) == Map("a" -> "b", "b" -> "a", "c" -> "a",
      "x" -> "c", "y" -> "x", "z" -> "x"))
    // x's in-triangle majority (y,z both 'x') beats the bridge's 'a'
    assert(lpa(g, 2) == Map("a" -> "a", "b" -> "a", "c" -> "a",
      "x" -> "x", "y" -> "c", "z" -> "c"))
    val m4 = lpa(g, 4)
    assert(m4("a") == m4("b") && m4("b") == m4("c"))
    assert(m4("x") == m4("y") && m4("y") == m4("z"))
    assert(m4("a") != m4("x")) // the bridge did not merge them
  }

  test("duplicate input edges collapse (no double voting)") {
    // n sees b twice and a once: dedup ties {a,b} -> 'a';
    // double-counting would elect 'b'
    val m = lpa(Seq("n" -> "b", "n" -> "b", "n" -> "a"), 1)
    assert(m("n") == "a")
  }

  test("star oscillates with period 2 (synchronous LPA's documented cycle)") {
    val g = (1 to 5).map(i => "hub" -> s"s$i")
    assert(lpa(g, 1) == lpa(g, 3))
    assert(lpa(g, 2) == lpa(g, 4))
    assert(lpa(g, 1) != lpa(g, 2))
  }

  test("deterministic across input partitioning") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 500).map(_ => s"n${rnd.nextInt(40)}" -> s"m${rnd.nextInt(40)}")
    val a = lpa(edges, 4)
    val b = LabelPropagation.run(edges.toDF("a", "b").repartition(7), "a", "b", 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("iters must be >= 1") {
    intercept[IllegalArgumentException] {
      LabelPropagation.run(Seq("a" -> "b").toDF("a", "b"), "a", "b", 0)
    }
  }
}
