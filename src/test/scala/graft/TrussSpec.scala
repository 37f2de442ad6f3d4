package graft

import graft.graph.Truss
import org.scalatest.funsuite.AnyFunSuite

class TrussSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def truss(edges: Seq[(String, String)], k: Int, iters: Int = 8) =
    Truss.ktruss(edges.toDF("u", "v"), "u", "v", k, iters)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  private val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d",
    "b" -> "c", "b" -> "d", "c" -> "d")

  test("K4 is a 4-truss (every edge in 2 triangles); k=5 empties it") {
    val m = truss(k4, 4)
    assert(m.size == 6 && m.values.forall(_ == 2L))
    assert(truss(k4, 5).isEmpty)
  }

  test("3-truss keeps triangles, drops pendant and bridge edges") {
    val g = Seq("a" -> "b", "b" -> "c", "a" -> "c", // triangle
      "c" -> "d", // pendant
      "d" -> "e") // chain
    val m = truss(g, 3)
    assert(m.keySet == Set(("a", "b"), ("b", "c"), ("a", "c")))
    assert(m.values.forall(_ == 1L))
  }

  test("deletion cascades: shared-edge triangle pair dies in two rounds at k=4") {
    // T1=(a,b,c), T2=(b,c,d): only (b,c) has support 2; round 1 keeps
    // just (b,c), whose triangles are then gone -> round 2 empties
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d", "c" -> "d")
    assert(truss(g, 4).isEmpty)
    // the fixed-iteration semantics: after ONE round (b,c) is still
    // present with its pre-cascade support
    assert(truss(g, 4, iters = 1) == Map(("b", "c") -> 2L))
  }

  test("triangle-free graphs empty at any k") {
    assert(truss(Seq("a" -> "b", "b" -> "c", "c" -> "d"), 3).isEmpty)
  }
}
