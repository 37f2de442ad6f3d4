package graft

import graft.model.Forecast
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ForecastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** local reference with the same init (l_1 = y_1, b_1 = y_1 − y_0) */
  private def ref(ys: Seq[Double], a: Double, b: Double, h: Int): (Double, Double, Double) = {
    var l = ys(1); var bt = ys(1) - ys(0)
    ys.drop(2).foreach { y =>
      val nl = a * y + (1 - a) * (l + bt)
      bt = b * (nl - l) + (1 - b) * bt
      l = nl
    }
    (l, bt, l + h * bt)
  }

  private def events(counts: Map[(String, Int), Int]) =
    counts.toSeq.flatMap { case ((k, day), n) =>
      Seq.fill(n)((k, day.toLong * 86400000L + 5L))
    }.toDF("k", "ms")

  test("matches the local recursion on a hand-built multi-key series with gaps") {
    // key A days 0..5 counts 2,4,0(gap),6,8,10; key B flat 3s
    val df = events(Map(
      ("A", 0) -> 2, ("A", 1) -> 4, ("A", 3) -> 6, ("A", 4) -> 8, ("A", 5) -> 10,
      ("B", 0) -> 3, ("B", 1) -> 3, ("B", 2) -> 3, ("B", 3) -> 3, ("B", 4) -> 3, ("B", 5) -> 3))
    val out = Forecast.holtLinear(df, Seq("k"), col("ms"), 86400000L, horizon = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    def rnd(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (la, ba, fa) = ref(Seq(2, 4, 0, 6, 8, 10), 0.5, 0.25, 2)
    assert(out("A") == ((6, rnd(la), rnd(ba), rnd(fa))), s"A: ${out("A")}")
    // a flat series: level converges to the constant, trend to ~0
    val (lb, bb, fb) = ref(Seq(3, 3, 3, 3, 3, 3), 0.5, 0.25, 2)
    assert(out("B") == ((6, rnd(lb), rnd(bb), rnd(fb))))
    assert(math.abs(out("B")._2 - 3.0) < 1e-9 && math.abs(out("B")._3) < 1e-9)
  }

  test("a linear ramp forecasts the continuation (trend captured)") {
    // y_t = 10 + 5t for 10 days: Holt is exact on pure linear input
    val df = events((0 until 10).map(d => ("L", d) -> (10 + 5 * d)).toMap)
    val r = Forecast.holtLinear(df, Seq("L" match { case _ => "k" }), col("ms"),
      86400000L, horizon = 3).collect().head
    assert(r.getDouble(2) == 55.0 && r.getDouble(3) == 5.0 && r.getDouble(4) == 70.0,
      s"level=${r.getDouble(2)} trend=${r.getDouble(3)} forecast=${r.getDouble(4)}")
  }

  test("guards: empty input, single bucket, bad params") {
    intercept[IllegalArgumentException] {
      Forecast.holtLinear(Seq(("a", 1L)).toDF("k", "ms").filter(lit(false)),
        Seq("k"), col("ms"), 86400000L, 1)
    }
    intercept[IllegalArgumentException] {
      Forecast.holtLinear(Seq(("a", 1L), ("a", 2L)).toDF("k", "ms"),
        Seq("k"), col("ms"), 86400000L, 1) // both in bucket 0
    }
    intercept[IllegalArgumentException] {
      Forecast.holtLinear(events(Map(("a", 0) -> 1, ("a", 1) -> 1)),
        Seq("k"), col("ms"), 86400000L, 1, alpha = 0.0)
    }
  }

  /** local Holt–Winters reference in the same op order. */
  private def refHw(ys: Seq[Double], m: Int, a: Double, b: Double, g: Double,
                    h: Int): (Double, Double, Double, Double) = {
    val sum1 = ys.take(m).sum; val sum2 = ys.slice(m, 2 * m).sum
    var l = sum1 / m; var bt = (sum2 - sum1) / (m * m)
    var s = ys.take(m).map(_ - l).toVector
    ys.drop(m).foreach { y =>
      val nl = a * (y - s(0)) + (1 - a) * (l + bt)
      val nb = b * (nl - l) + (1 - b) * bt
      val ns = g * (y - nl) + (1 - g) * s(0)
      s = s.drop(1) :+ ns; l = nl; bt = nb
    }
    (l, bt, s(h - 1), l + h * bt + s(h - 1))
  }

  test("Holt–Winters matches the local recursion and recovers a planted weekly pattern") {
    // 28 days: ramp 100+2t plus weekly pattern [+20,0,-10,0,0,0,-10]
    val pat = Seq(20, 0, -10, 0, 0, 0, -10)
    val counts = (0 until 28).map(d => ("W", d) -> (100 + 2 * d + pat(d % 7))).toMap
    // horizon 1 lands on day 28 ≡ 0 (mod 7) — the +20 spike day, where
    // the seasonal component decides the forecast
    val out = Forecast.holtWinters(events(counts), Seq("k"), col("ms"),
      86400000L, m = 7, horizon = 1).collect().head
    def rnd(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ys = (0 until 28).map(d => (100 + 2 * d + pat(d % 7)).toDouble)
    val (l, b, sh, f) = refHw(ys, 7, 0.5, 0.25, 0.25, 1)
    assert(out.getInt(1) == 28)
    assert((out.getDouble(2), out.getDouble(3), out.getDouble(4), out.getDouble(5))
      == ((rnd(l), rnd(b), rnd(sh), rnd(f))))
    // trend lands in the planted +2/day's neighborhood (α/β smoothing
    // wobble on 21 recursion steps measured ±0.9) and HW beats plain
    // Holt decisively on the spike day
    assert(math.abs(out.getDouble(3) - 2.0) < 1.2)
    val truthNext = 100 + 2 * 28 + pat(0)
    val hwErr = math.abs(out.getDouble(5) - truthNext)
    val hl = Forecast.holtLinear(events(counts), Seq("k"), col("ms"),
      86400000L, horizon = 1).collect().head.getDouble(4)
    assert(hwErr < math.abs(hl - truthNext),
      s"HW err $hwErr not better than Holt ${math.abs(hl - truthNext)}")
  }

  test("Holt–Winters: partition invariance and the two-season guard") {
    val counts = (0 until 21).map(d => ("P", d) -> (50 + (d % 7) * 3)).toMap
    val a = Forecast.holtWinters(events(counts), Seq("k"), col("ms"),
      86400000L, 7, 3).collect().map(_.toString).toSeq
    val b = Forecast.holtWinters(events(counts).repartition(9), Seq("k"), col("ms"),
      86400000L, 7, 3).collect().map(_.toString).toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Forecast.holtWinters(events((0 until 13).map(d => ("P", d) -> 1).toMap),
        Seq("k"), col("ms"), 86400000L, 7, 3) // 13 < 2m buckets
    }
    intercept[IllegalArgumentException] {
      Forecast.holtWinters(events(counts), Seq("k"), col("ms"), 86400000L, 7, 8)
    }
  }

  test("CUSUM: planted level shift alarms at the right bucket; stable series never alarms") {
    // key S: baseline 3/day for 10 days, then a jump to 15/day — with
    // kappa=2 and h=20 the alarm fires once S+ accumulates past 20:
    // each post-shift day adds (15 - 3 - 2) = 10, so day 12 (index)
    // S+ = 20 (not > 20), day 13? walk: i=10 S=10, i=11 S=20, i=12 S=30 > 20 -> alarm at 12
    val shifted = (0 until 10).map(d => ("S", d) -> 3) ++ (10 until 20).map(d => ("S", d) -> 15)
    val stable = (0 until 20).map(d => ("F", d) -> 4)
    val df = events((shifted ++ stable).toMap)
    val out = graft.model.Forecast.cusum(df, Seq("k"), col("ms"), 86400000L,
      baseline = 10, kappa = 2.0, h = 20.0)
      .collect().map(r => r.getString(0) -> ((r.getDouble(2), r.getInt(5)))).toMap
    assert(out("S") == ((3.0, 12)), s"S: ${out("S")}")
    assert(out("F")._2 == -1, s"stable series alarmed: ${out("F")}")
  }

  test("CUSUM: downward drift trips the lower side; guards reject short series") {
    val drop = (0 until 10).map(d => ("D", d) -> 20) ++ (10 until 16).map(d => ("D", d) -> 5)
    val out = graft.model.Forecast.cusum(events(drop.toMap), Seq("k"), col("ms"),
      86400000L, baseline = 10, kappa = 3.0, h = 20.0)
      .collect().map(r => (r.getDouble(4), r.getInt(5))).head
    // each post-shift day adds (20 - 3 - 5) = 12 to S-: i=10 12, i=11 24 > 20 -> alarm 11
    assert(out._2 == 11, s"lower-side alarm: $out")
    intercept[IllegalArgumentException] {
      graft.model.Forecast.cusum(events(Map(("a", 0) -> 1, ("a", 1) -> 1)),
        Seq("k"), col("ms"), 86400000L, baseline = 10, kappa = 1.0, h = 5.0)
    }
  }
}
