package graft

import graft.graph.PageRank
import org.scalatest.funsuite.AnyFunSuite

class PageRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000000L
  private val TP = 150000000L // (15*S) div 100

  private def ranks(edges: Seq[(String, String)], iters: Int): Map[String, Long] =
    PageRank.run(edges.toDF("s", "t"), "s", "t", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("iters=0 returns the uniform start") {
    val m = ranks(Seq("a" -> "b", "b" -> "c"), 0)
    assert(m == Map("a" -> S, "b" -> S, "c" -> S))
  }

  test("one iteration, hand-computed: split contributions, dangling leak, source at teleport") {
    // a -> b, a -> c, b -> c; c dangling, a has no in-edges
    val m = ranks(Seq("a" -> "b", "a" -> "c", "b" -> "c"), 1)
    assert(m("a") == TP)                                   // no in-edges
    assert(m("b") == TP + 85L * (S / 2) / 100)             // half of a
    assert(m("c") == TP + 85L * (S / 2 + S) / 100)         // half of a + all of b
  }

  test("two iterations, hand-computed chain") {
    val m1 = ranks(Seq("a" -> "b", "b" -> "c"), 1)
    val m2 = ranks(Seq("a" -> "b", "b" -> "c"), 2)
    assert(m2("a") == TP)
    assert(m2("b") == TP + 85L * m1("a") / 100)
    assert(m2("c") == TP + 85L * m1("b") / 100)
  }

  test("star graph: the hub out-ranks every spoke") {
    val edges = (1 to 20).map(i => s"s$i" -> "hub")
    val m = ranks(edges, 3)
    assert((1 to 20).forall(i => m("hub") > m(s"s$i")))
    assert(m("hub") == TP + 85L * (20L * TP) / 100) // spokes settle at teleport after iter 1
  }

  test("deterministic across input partitioning") {
    val rnd = new scala.util.Random(3)
    val edges = (1 to 500).map(_ => s"n${rnd.nextInt(40)}" -> s"n${rnd.nextInt(40)}")
    val df1 = edges.toDF("s", "t").repartition(1)
    val df7 = edges.toDF("s", "t").repartition(7)
    val a = PageRank.run(df1, "s", "t", 4).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = PageRank.run(df7, "s", "t", 4).collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("personalized: teleport and start mass land only on seeds") {
    // a -> b -> c, seed {a}
    val df = Seq("a" -> "b", "b" -> "c").toDF("s", "t")
    val m1 = PageRank.personalized(df, "s", "t", _ === "a", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m1("a") == TP)                       // seed, no in-edges
    assert(m1("b") == 85L * S / 100)            // non-seed: damped inflow only
    assert(m1("c") == 0L)                       // nothing arrived yet
    val m2 = PageRank.personalized(df, "s", "t", _ === "a", 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m2("b") == 85L * m1("a") / 100)
    assert(m2("c") == 85L * m1("b") / 100)
  }

  test("personalized with an all-true seed == plain run") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 300).map(_ => s"n${rnd.nextInt(30)}" -> s"n${rnd.nextInt(30)}")
    val df = edges.toDF("s", "t")
    val a = PageRank.run(df, "s", "t", 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val b = PageRank.personalized(df, "s", "t", _.isNotNull, 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a == b)
  }

  test("multi-edges contribute multiply (parallel edges are real edges)") {
    // two parallel a->b edges and one a->c: b gets 2/3 of a's rank
    val m = ranks(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1)
    assert(m("b") == TP + 85L * (2L * (S / 3)) / 100)
    assert(m("c") == TP + 85L * (S / 3) / 100)
  }
}
