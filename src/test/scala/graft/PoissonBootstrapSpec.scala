package graft

import graft.stream.StreamingDistinct.h52Long
import graft.util.PoissonBootstrap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PoissonBootstrap: threshold ladder sanity, exact agreement with a
  * driver-side recount, CI rank semantics, partition invariance, and
  * interval coverage of the true mean on a seeded fixture. */
class PoissonBootstrapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def kOf(h: Long): Int = {
    val t = PoissonBootstrap.CumThresholds
    var k = 0
    while (k < t.length && h >= t(k)) k += 1
    k
  }

  test("threshold ladder: monotone, e^-1 head, ~1e-5 tail absorbed by the k=8 cell") {
    val t = PoissonBootstrap.CumThresholds
    assert(t.length == 8 && t.sameElements(t.sorted))
    assert(math.abs(t(0) / 4503599627370496.0 - math.exp(-1.0)) < 1e-12)
    // P(K >= 8) for Poisson(1) is 1.02e-5 — those hashes land on k = 8
    assert((4503599627370496L - t(7)) / 4503599627370496.0 < 2e-5)
  }

  test("weights behave like Poisson(1): mean ~ 1, var ~ 1 over 50k hash draws") {
    val ks = (0 until 50000).map(i => kOf(h52Long(9L, s"row$i")).toDouble)
    val m = ks.sum / ks.size
    val v = ks.map(x => (x - m) * (x - m)).sum / ks.size
    assert(math.abs(m - 1.0) < 0.02, s"mean $m")
    assert(math.abs(v - 1.0) < 0.05, s"var $v")
  }

  test("replica means: exact agreement with the driver recount") {
    val rows = (0 until 60).map(i => (s"g${i % 2}", i.toLong, (i * 37 % 100 + 1).toLong))
    val df = rows.toDF("g", "pk", "v")
    val got = PoissonBootstrap.replicaMeans(df, Seq("g"), "v", Seq("pk"),
        b = 8, seed = 42L)
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), if (r.isNullAt(3)) null else r.getLong(3))).toMap
    val want = (for { (g, pk, v) <- rows; r <- 0 until 8 }
      yield (g, r, v, kOf(h52Long(42L, s"$pk|$r")).toLong))
      .groupBy(t => (t._1, t._2))
      .map { case (key, xs) =>
        val sk = xs.map(_._4).sum; val skx = xs.map(t => t._3 * t._4).sum
        val mean: Any = if (sk > 0) (skx / sk) * 1000000L + (skx % sk) * 1000000L / sk else null
        key -> (sk, mean)
      }
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (sk, mean)) =>
      assert(got(k) == ((sk, mean)), s"replica $k")
    }
  }

  test("CI is the loRank-th order statistic from both ends; covers the true mean") {
    val rows = (0 until 500).map(i => ("g", i.toLong, (1000 + (i * 997 % 200)).toLong))
    val trueMeanE6 = rows.map(_._3).sum * 1000000L / rows.size
    val reps = PoissonBootstrap.replicaMeans(rows.toDF("g", "pk", "v"),
      Seq("g"), "v", Seq("pk"), b = 32, seed = 42L)
    val means = reps.collect().map(_.getLong(3)).sorted
    val ci = PoissonBootstrap.ci(reps, Seq("g"), loRank = 2).collect()(0)
    assert(ci.getLong(1) == 32)
    assert(ci.getLong(2) == means(1) && ci.getLong(3) == means(30))
    assert(ci.getLong(2) <= trueMeanE6 && trueMeanE6 <= ci.getLong(3),
      s"true $trueMeanE6 outside [${ci.getLong(2)}, ${ci.getLong(3)}]")
    // interval is non-degenerate: resampling produced real spread
    assert(ci.getLong(3) > ci.getLong(2))
  }

  test("partition invariance") {
    val df = (0 until 200).map(i => (s"g${i % 3}", i.toLong, (i % 50).toLong))
      .toDF("g", "pk", "v")
    val a = PoissonBootstrap.replicaMeans(df, Seq("g"), "v", Seq("pk"), 8, 7L)
      .collect().map(_.toString).sorted.toSeq
    val b = PoissonBootstrap.replicaMeans(df.repartition(11), Seq("g"), "v", Seq("pk"), 8, 7L)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
