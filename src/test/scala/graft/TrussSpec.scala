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

  // ---- full decomposition (max trussness per edge) ----

  private def decomp(edges: Seq[(String, String)], kMax: Int = 8, inner: Int = 16) =
    Truss.trussness(edges.toDF("u", "v"), "u", "v", kMax, inner)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("trussness: K4 + pendant triangle + bridge + chain, hand-worked") {
    // K4 on {a,b,c,d} (trussness 4), a triangle (d,e,f) hanging off d
    // (trussness 3), a bridge (f,g) and a chain edge (g,h): trussness 2
    val g = k4 ++ Seq("d" -> "e", "d" -> "f", "e" -> "f", "f" -> "g", "g" -> "h")
    val m = decomp(g)
    assert(k4.forall(e => m(e) == 4L))
    assert(m(("d", "e")) == 3L && m(("d", "f")) == 3L && m(("e", "f")) == 3L)
    assert(m(("f", "g")) == 2L && m(("g", "h")) == 2L)
  }

  test("trussness: K5 every edge 5; the kMax cap reports kMax as '>= kMax'") {
    val nodes = Seq("a", "b", "c", "d", "e")
    val k5 = for (i <- nodes.indices; j <- i + 1 until nodes.size)
      yield nodes(i) -> nodes(j)
    val exact = decomp(k5)
    assert(exact.size == 10 && exact.values.forall(_ == 5L))
    val capped = decomp(k5, kMax = 4)
    assert(capped.values.forall(_ == 4L)) // >= kMax reported as kMax
  }

  test("trussness: cascade case — shared-edge triangle pair peels entirely to 3") {
    // T1=(a,b,c), T2=(b,c,d): at k=4 the cascade empties everything
    // (TrussSpec k=4 case), so every edge has trussness exactly 3
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d", "c" -> "d")
    assert(decomp(g).values.toSet == Set(3L))
  }

  test("trussness: endpoint order normalized, duplicates and self-loops dropped") {
    val g = Seq("b" -> "a", "a" -> "b", "c" -> "a", "b" -> "c", "a" -> "a")
    val m = decomp(g)
    assert(m == Map(("a", "b") -> 3L, ("a", "c") -> 3L, ("b", "c") -> 3L))
  }
}
