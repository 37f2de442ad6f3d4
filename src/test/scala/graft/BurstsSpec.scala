package graft

import graft.stream.Bursts
import org.scalatest.funsuite.AnyFunSuite

class BurstsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 3600000L

  /** counts: (type, hour) -> n events in that hour */
  private def bursts(counts: Seq[(String, Long, Int)], baseline: Int,
                     thresholdE4: Long): Map[(String, Long), (Long, Long, Int)] =
    Bursts.hourlyBursts(
      counts.flatMap { case (t, h, n) => (1 to n).map(i => (t, h * H + i)) }
        .toDF("event_type", "ts_ms"),
      "event_type", "ts_ms", baseline, thresholdE4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap

  test("hand-computed rates; burst fires only past the threshold") {
    val m = bursts(Seq(("a", 0L, 10), ("a", 1L, 10), ("a", 2L, 10), ("a", 3L, 40)),
      baseline = 2, thresholdE4 = 20000L)
    assert(m(("a", 0L)) == ((10L, -1L, 0))) // no trailing rows
    assert(m(("a", 1L)) == ((10L, -1L, 0))) // partial baseline
    assert(m(("a", 2L)) == ((10L, 10000L, 0))) // 10 vs mean(10,10)
    assert(m(("a", 3L)) == ((40L, 40000L, 1))) // 40 vs mean(10,10) = 4x
  }

  test("the trailing window excludes the burst hour itself") {
    // if h3's own 40 entered the baseline, the rate would be
    // 40*2e4/60 = 13333 and no burst would fire
    val m = bursts(Seq(("a", 1L, 10), ("a", 2L, 10), ("a", 3L, 40)),
      baseline = 2, thresholdE4 = 30000L)
    assert(m(("a", 3L)) == ((40L, 40000L, 1)))
  }

  test("trailing rows are observed hours (sparse series contract)") {
    val m = bursts(Seq(("a", 0L, 10), ("a", 5L, 10), ("a", 6L, 10)),
      baseline = 2, thresholdE4 = 20000L)
    assert(m(("a", 6L)) == ((10L, 10000L, 0))) // trail = hours 0 and 5
  }

  test("types are independent baselines") {
    val m = bursts(Seq(("a", 0L, 100), ("b", 0L, 1), ("a", 1L, 100), ("b", 1L, 1),
      ("a", 2L, 100), ("b", 2L, 10)), baseline = 2, thresholdE4 = 20000L)
    assert(m(("a", 2L))._3 == 0) // flat at its own (high) baseline
    assert(m(("b", 2L)) == ((10L, 100000L, 1))) // 10x its tiny baseline
  }

  test("baseline must be positive") {
    intercept[IllegalArgumentException] {
      Bursts.hourlyBursts(Seq(("a", 1L)).toDF("event_type", "ts_ms"),
        "event_type", "ts_ms", 0, 1L)
    }
  }
}
