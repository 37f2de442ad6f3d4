package graft

import graft.stream.Funnel
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val steps = Seq("A", "B", "C")

  private def funnel(evs: Seq[(Long, Long, String)]): Map[Long, (Long, Long, Long, Int)] =
    Funnel.windowFunnel(evs.toDF("user_id", "ts_ms", "event_type"),
      "user_id", "event_type", "ts_ms", steps)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap

  test("straight conversion reaches stage 3") {
    assert(funnel(Seq((1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"))) ==
      Map(1L -> ((10L, 20L, 30L, 3))))
  }

  test("input order is irrelevant (the walk sorts)") {
    assert(funnel(Seq((1L, 30L, "C"), (1L, 10L, "A"), (1L, 20L, "B"))) ==
      Map(1L -> ((10L, 20L, 30L, 3))))
  }

  test("a step before its predecessor does not count") {
    assert(funnel(Seq((1L, 5L, "B"), (1L, 10L, "A"), (1L, 20L, "B"))) ==
      Map(1L -> ((10L, 20L, -1L, 2))))
  }

  test("equal timestamps do not advance (strict order)") {
    assert(funnel(Seq((1L, 10L, "A"), (1L, 10L, "B"))) ==
      Map(1L -> ((10L, -1L, -1L, 1))))
  }

  test("the FIRST qualifying event wins, not the first seen") {
    assert(funnel(Seq((1L, 10L, "A"), (1L, 50L, "B"), (1L, 20L, "B"))) ==
      Map(1L -> ((10L, 20L, -1L, 2))))
  }

  test("min first-step across duplicates") {
    assert(funnel(Seq((1L, 10L, "A"), (1L, 5L, "A"), (1L, 7L, "B"))) ==
      Map(1L -> ((5L, 7L, -1L, 2))))
  }

  test("user with only later steps sits at stage 0") {
    assert(funnel(Seq((1L, 10L, "B"), (1L, 20L, "C"))) ==
      Map(1L -> ((-1L, -1L, -1L, 0))))
  }

  test("non-step events are ignored and users without step events absent") {
    val m = Funnel.windowFunnel(
      Seq((1L, 10L, "A"), (1L, 11L, "X"), (2L, 5L, "X"))
        .toDF("user_id", "ts_ms", "event_type"),
      "user_id", "event_type", "ts_ms", steps)
      .collect().map(_.getLong(0)).toSet
    assert(m == Set(1L))
  }

  test("users are independent") {
    val m = funnel(Seq((1L, 10L, "A"), (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "C")))
    assert(m(1L) == ((10L, -1L, -1L, 1)) && m(2L) == ((1L, 2L, 3L, 3)))
  }

  test("steps must be distinct") {
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(Seq((1L, 1L, "A")).toDF("user_id", "ts_ms", "event_type"),
        "user_id", "event_type", "ts_ms", Seq("A", "A"))
    }
  }
}
