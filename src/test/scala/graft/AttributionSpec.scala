package graft

import graft.stream.Attribution
import org.scalatest.funsuite.AnyFunSuite

class AttributionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // (event_id, user_id, event_type, ts_ms)
  private def run(evs: Seq[(Long, Long, String, Long)], lookback: Long) =
    Attribution.lastTouch(
      evs.toDF("event_id", "user_id", "event_type", "ts_ms"),
      "purchase", Seq("view", "click"), lookback)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.getString(4)), Option(r.get(5)).map(_.asInstanceOf[Long]))))
      .toMap

  test("the LATEST preceding touch wins") {
    val out = run(Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "purchase", 25L)), 100L)
    assert(out(3L) == ((Some(2L), Some("click"), Some(20L))))
  }

  test("touches older than the lookback yield NULL credit") {
    val out = run(Seq((1L, 1L, "view", 10L), (2L, 1L, "purchase", 200L)), 50L)
    assert(out(2L) == ((None, None, None)))
  }

  test("lookback boundary is inclusive") {
    val out = run(Seq((1L, 1L, "view", 150L), (2L, 1L, "purchase", 200L)), 50L)
    assert(out(2L) == ((Some(1L), Some("view"), Some(150L))))
  }

  test("a touch at the conversion's exact ms matches; max event_id breaks ts ties") {
    val out = run(Seq(
      (5L, 1L, "click", 20L), (7L, 1L, "view", 20L), (9L, 1L, "purchase", 20L)), 100L)
    assert(out(9L) == ((Some(7L), Some("view"), Some(20L))))
  }

  test("no touch at all -> left-outer NULLs; non-touch types are ignored") {
    val out = run(Seq(
      (1L, 1L, "signup", 10L), (2L, 1L, "purchase", 20L),
      (3L, 2L, "view", 5L), (4L, 2L, "purchase", 30L)), 100L)
    assert(out(2L) == ((None, None, None)))
    assert(out(4L) == ((Some(3L), Some("view"), Some(5L))))
  }

  private def runLinear(evs: Seq[(Long, Long, String, Long)], lookback: Long, bin: Long) =
    Attribution.linearTouch(
      evs.toDF("event_id", "user_id", "event_type", "ts_ms"),
      "purchase", Seq("view", "click"), lookback, bin)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getString(4), r.getLong(5), r.getLong(6))))
      .toMap

  test("linear: every in-window touch shares the credit equally") {
    val out = runLinear(Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "view", 30L),
      (4L, 1L, "purchase", 40L)), 100L, 100L)
    assert(out.size == 3)
    assert(out((4L, 1L)) == (("view", 10L, 333333L)))
    assert(out((4L, 2L)) == (("click", 20L, 333333L)))
    assert(out((4L, 3L)) == (("view", 30L, 333333L)))
  }

  test("linear: window boundaries inclusive on both ends, outside excluded") {
    val out = runLinear(Seq(
      (1L, 1L, "view", 100L),   // == cms - L: in
      (2L, 1L, "click", 200L),  // == cms: in
      (3L, 1L, "view", 99L),    // out
      (4L, 1L, "purchase", 200L)), 100L, 100L)
    assert(out.keySet == Set((4L, 1L), (4L, 2L)))
    assert(out.values.forall(_._3 == 500000L))
  }

  test("linear: bin boundaries never lose matches (narrow bins vs one wide bin)") {
    val evs = Seq(
      (1L, 1L, "view", 5L), (2L, 1L, "click", 57L), (3L, 1L, "view", 99L),
      (4L, 1L, "purchase", 100L),
      (5L, 2L, "view", 98L), (6L, 2L, "purchase", 150L))
    val narrow = runLinear(evs, 95L, 7L)
    val wide = runLinear(evs, 95L, 1000L)
    assert(narrow == wide && narrow.size == 4)
  }

  test("linear: conversions without touches are absent; users never cross") {
    val out = runLinear(Seq(
      (1L, 1L, "purchase", 50L),
      (2L, 2L, "view", 40L), (3L, 2L, "purchase", 60L)), 100L, 50L)
    assert(out.keySet == Set((3L, 2L)))
    assert(out((3L, 2L))._3 == 1000000L)
  }

  test("each conversion attributes independently (two purchases, one user)") {
    val out = run(Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "purchase", 15L),
      (3L, 1L, "click", 30L), (4L, 1L, "purchase", 35L)), 100L)
    assert(out(2L) == ((Some(1L), Some("view"), Some(10L))))
    assert(out(4L) == ((Some(3L), Some("click"), Some(30L))))
  }

  private def runDecay(evs: Seq[(Long, Long, String, Long)], lookback: Long,
                       bin: Long, halfLife: Long) =
    Attribution.timeDecayTouch(
      evs.toDF("event_id", "user_id", "event_type", "ts_ms"),
      "purchase", Seq("view", "click"), lookback, bin, halfLife)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> ((r.getLong(6), r.getLong(7))))
      .toMap

  test("time-decay: hand-worked half-life buckets and normalization") {
    // ages 25, 15, 5 at halfLife 10 -> buckets 2, 1, 0 ->
    // weights 250000, 500000, 1000000; W = 1750000
    val out = runDecay(Seq(
      (1L, 1L, "view", 75L), (2L, 1L, "click", 85L), (3L, 1L, "view", 95L),
      (4L, 1L, "purchase", 100L)), 100L, 100L, 10L)
    assert(out((4L, 1L)) == ((250000L, 250000L * 1000000L / 1750000L)))
    assert(out((4L, 2L)) == ((500000L, 500000L * 1000000L / 1750000L)))
    assert(out((4L, 3L)) == ((1000000L, 1000000L * 1000000L / 1750000L)))
    // credits sum to 10^6 minus truncation remainders, never more
    val total = out.values.map(_._2).sum
    assert(total <= 1000000L && total > 1000000L - 3)
  }

  test("time-decay: a same-ms touch gets full weight; bucket 40 clamps to 0 credit") {
    val out = runDecay(Seq(
      (1L, 1L, "view", 100L), (2L, 1L, "purchase", 100L),
      // user 2: only an ancient touch -> weight 0 -> guarded credit 0
      (3L, 2L, "view", 0L), (4L, 2L, "purchase", 41L)), 50L, 50L, 1L)
    assert(out((2L, 1L)) == ((1000000L, 1000000L)))
    assert(out((4L, 3L)) == ((0L, 0L)))
  }

  test("time-decay matches linear when the half-life dwarfs the lookback") {
    val evs = Seq(
      (1L, 1L, "view", 10L), (2L, 1L, "click", 40L), (3L, 1L, "view", 70L),
      (4L, 1L, "purchase", 80L))
    val dec = runDecay(evs, 100L, 100L, 1000000L)
    val lin = runLinear(evs, 100L, 100L)
    assert(dec.view.mapValues(_._2).toMap == lin.view.mapValues(_._3).toMap)
  }
}
