package graft

import graft.graph.Hits
import org.scalatest.funsuite.AnyFunSuite

class HitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 1000000L

  private def hits(edges: Seq[(String, String)], iters: Int): Map[String, (Long, Long)] =
    Hits.run(edges.toDF("s", "t"), "s", "t", iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("one round hand-computed: a->b, a->c, b->c") {
    val m = hits(Seq("a" -> "b", "a" -> "c", "b" -> "c"), 1)
    // a_raw: b=S (from a), c=2S (from a and b); sum 3S
    val ab = S * S / (3 * S) // 333333
    val ac = 2 * S * S / (3 * S) // 666666
    // h_raw: a=ab+ac, b=ac; sum ab+2*ac
    val hsum = ab + 2 * ac
    assert(m("b") == ((ac * S / hsum, ab)))
    assert(m("c") == ((0L, ac))) // no out-edges -> hub 0
    assert(m("a") == (((ab + ac) * S / hsum, 0L))) // no in-edges -> auth 0
  }

  test("two rounds chain from round-one scores") {
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "c")
    val m1 = hits(g, 1)
    val m2 = hits(g, 2)
    val a2b = m1("a")._1
    val a2c = m1("a")._1 + m1("b")._1
    val asum = a2b + a2c
    val ab = a2b * S / asum
    val ac = a2c * S / asum
    val hsum = (ab + ac) + ac
    assert(m2("b") == ((ac * S / hsum, ab)))
    assert(m2("c") == ((0L, ac)))
    assert(m2("a") == (((ab + ac) * S / hsum, 0L)))
  }

  test("star: the center is the sole hub at full scale, spokes split authority") {
    val k = 8
    val m = hits((1 to k).map(i => "hub" -> s"v$i"), 2)
    assert(m("hub") == ((S, 0L))) // only hub -> rescale pins it at scale
    (1 to k).foreach(i => assert(m(s"v$i") == ((0L, S / k))))
  }

  test("parallel edges contribute multiply") {
    // two a->b edges, one a->c: b draws twice a's hub mass
    val m = hits(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1)
    assert(m("b")._2 == 2 * S * S / (3 * S))
    assert(m("c")._2 == S * S / (3 * S))
  }

  test("deterministic across input partitioning") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 400).map(_ => s"n${rnd.nextInt(30)}" -> s"m${rnd.nextInt(30)}")
    val a = hits(edges, 3)
    val b = Hits.run(edges.toDF("s", "t").repartition(7), "s", "t", 3)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
  }

  test("non-broadcast path (broadcastMaxNodes=0) matches the broadcast plan") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 300).map(_ => s"n${rnd.nextInt(25)}" -> s"m${rnd.nextInt(25)}")
    val a = hits(edges, 2)
    val b = Hits.run(edges.toDF("s", "t"), "s", "t", 2, broadcastMaxNodes = 0)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
  }

  test("iters must be >= 1") {
    intercept[IllegalArgumentException] {
      Hits.run(Seq("a" -> "b").toDF("s", "t"), "s", "t", 0)
    }
  }
}
