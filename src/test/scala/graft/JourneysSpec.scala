package graft

import graft.stream.Journeys
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JourneysSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def trans(evs: Seq[(Long, Long, Long, String)], gapMs: Long): Map[(String, String), Long] =
    Journeys.sessionTransitions(
      evs.toDF("user_id", "event_id", "ms", "event_type")
        .withColumn("ts", timestamp_millis(col("ms"))),
      gapMs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("one session walks entry, transitions, exit") {
    val m = trans(Seq((1L, 1L, 0L, "A"), (1L, 2L, 50L, "B"), (1L, 3L, 120L, "C")), 100L)
    assert(m == Map(("^", "A") -> 1L, ("A", "B") -> 1L, ("B", "C") -> 1L, ("C", "$") -> 1L))
  }

  test("a gap splits the session") {
    val m = trans(Seq((1L, 1L, 0L, "A"), (1L, 2L, 300L, "B")), 100L)
    assert(m == Map(("^", "A") -> 1L, ("A", "$") -> 1L, ("^", "B") -> 1L, ("B", "$") -> 1L))
  }

  test("counts aggregate across users") {
    val m = trans(Seq(
      (1L, 1L, 0L, "A"), (1L, 2L, 10L, "B"),
      (2L, 3L, 0L, "A"), (2L, 4L, 10L, "B")), 100L)
    assert(m == Map(("^", "A") -> 2L, ("A", "B") -> 2L, ("B", "$") -> 2L))
  }

  test("equal timestamps order by event_id") {
    val m = trans(Seq((1L, 2L, 10L, "B"), (1L, 1L, 10L, "A")), 100L)
    assert(m == Map(("^", "A") -> 1L, ("A", "B") -> 1L, ("B", "$") -> 1L))
  }

  test("entries equal exits equal session count") {
    val rnd = new scala.util.Random(17)
    val evs = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, i.toLong, rnd.nextInt(5000).toLong,
        Seq("A", "B", "C")(rnd.nextInt(3))))
    val m = trans(evs, 400L)
    val entries = m.collect { case (("^", _), n) => n }.sum
    val exits = m.collect { case ((_, "$"), n) => n }.sum
    assert(entries == exits && entries > 0)
  }
}
