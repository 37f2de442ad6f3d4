package graft

import graft.util.AbTest
import org.scalatest.funsuite.AnyFunSuite

/** AbTest.welch: hand-computed t/df on a tiny fixture, n<2 group drop,
  * zero-variance NULL guard, pair orientation, partition invariance. */
class WelchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver reference with the same pinned op tree. */
  private def ref(x: Seq[Long], y: Seq[Long]): (Long, Long) = {
    def mom(v: Seq[Long]) = (v.size.toLong, v.sum, v.map(a => a * a).sum)
    val (n1, s1, ss1) = mom(x); val (n2, s2, ss2) = mom(y)
    val r1 = (n1.toDouble * ss1 - s1.toDouble * s1) / (n1.toDouble * n1 * (n1 - 1))
    val r2 = (n2.toDouble * ss2 - s2.toDouble * s2) / (n2.toDouble * n2 * (n2 - 1))
    val se = r1 + r2
    val t = (s1.toDouble / n1 - s2.toDouble / n2) / math.sqrt(se)
    val df = (se * se) / (r1 * r1 / (n1 - 1) + r2 * r2 / (n2 - 1))
    (math.round(t * 1e6), math.round(df * 1e6))
  }

  test("hand fixture matches the reference; sanity vs known direction") {
    val x = Seq(10L, 12L, 11L, 13L, 14L)   // mean 12
    val y = Seq(20L, 22L, 21L, 19L, 23L)   // mean 21
    val df = (x.map(("a", _)) ++ y.map(("b", _))).toDF("g", "v")
    val rows = AbTest.welch(df, "g", "v").collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getString(0) == "a" && r.getString(1) == "b")
    assert(r.getLong(2) == 5 && r.getLong(3) == 5)
    assert(r.getLong(4) == 60L && r.getLong(5) == 105L)
    val (t, d) = ref(x, y)
    assert(r.getLong(6) == t && r.getLong(7) == d)
    assert(r.getLong(6) < 0) // mean(a) < mean(b)
  }

  test("three variants produce the three ordered pairs; n<2 dropped") {
    val df = (Seq.fill(3)(("a", 5L)) ++ Seq(("b", 1L), ("b", 9L)) ++
      Seq(("c", 7L), ("c", 7L)) ++ Seq(("solo", 4L))).toDF("g", "v")
    val got = AbTest.welch(df, "g", "v").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("zero variance on both sides -> NULL t/df, moments still exact") {
    val df = (Seq.fill(4)(("a", 5L)) ++ Seq.fill(3)(("b", 9L))).toDF("g", "v")
    val r = AbTest.welch(df, "g", "v").collect()(0)
    assert(r.isNullAt(6) && r.isNullAt(7))
    assert(r.getLong(4) == 20L && r.getLong(5) == 27L)
    // one-sided variance is enough for a defined t
    val df2 = (Seq.fill(4)(("a", 5L)) ++ Seq(("b", 8L), ("b", 10L))).toDF("g", "v")
    val r2 = AbTest.welch(df2, "g", "v").collect()(0)
    assert(!r2.isNullAt(6))
  }

  test("partition invariance and null-value drop") {
    val rnd = new scala.util.Random(31L)
    val rows = (0 until 500).map { i =>
      (if (i % 3 == 0) "x" else if (i % 3 == 1) "y" else "z",
        if (i % 97 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextInt(1000).toLong))
    }
    val df = rows.toDF("g", "v")
    val a = AbTest.welch(df, "g", "v").collect().map(_.toString).sorted
    val b = AbTest.welch(df.repartition(13), "g", "v").collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == 3)
  }
}
