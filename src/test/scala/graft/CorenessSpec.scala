package graft

import graft.graph.Coreness
import org.scalatest.funsuite.AnyFunSuite

class CorenessSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def core(edges: Seq[(String, String)], iters: Int = 20): Map[String, Long] =
    Coreness.run(edges.toDF("u", "v"), "u", "v", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("path graph is all 1-core") {
    assert(core(Seq("a" -> "b", "b" -> "c", "c" -> "d")) ==
      Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 1L))
  }

  test("triangle with a pendant: triangle 2, pendant 1") {
    assert(core(Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d")) ==
      Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("K4 with a 2-node tail: clique 3, tail 1") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val m = core(k4 ++ Seq("d" -> "e", "e" -> "f"))
    assert(m == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L, "e" -> 1L, "f" -> 1L))
  }

  test("star: hub degree does not inflate coreness") {
    val m = core((1 to 6).map(i => "h" -> s"s$i"))
    assert(m.values.forall(_ == 1L))
  }

  test("broadcast path == shuffle path (broadcastMaxNodes = 0 forces the shuffle join)") {
    val g = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
      "c" -> "d", "d" -> "e", "e" -> "f", "f" -> "g", "g" -> "a")
    val small = core(g)
    val big = Coreness.run(g.toDF("u", "v"), "u", "v", 20, broadcastMaxNodes = 0L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(small == big)
  }

  test("the 20-round iterate is stationary (== 25 rounds) and iters=0 is the degree") {
    // a graph needing several peel waves: K4 + chain of pendants
    val g = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d",
      "c" -> "d", "d" -> "e", "e" -> "f", "f" -> "g")
    assert(core(g, 20) == core(g, 25))
    assert(core(g, 0) == Map("a" -> 3L, "b" -> 3L, "c" -> 3L,
      "d" -> 4L, "e" -> 2L, "f" -> 2L, "g" -> 1L))
  }
}
