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

  private def funnelH(evs: Seq[(Long, Long, String)], h: Long): Map[Long, (Long, Long, Long, Int)] =
    Funnel.windowFunnel(evs.toDF("user_id", "ts_ms", "event_type"),
      "user_id", "event_type", "ts_ms", steps, horizonMs = Some(h))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))))
      .toMap

  test("conversion horizon blocks steps landing after anchor + horizon") {
    assert(funnelH(Seq((1L, 0L, "A"), (1L, 50L, "B"), (1L, 200L, "C")), 100L) ==
      Map(1L -> ((0L, 50L, -1L, 2))))
  }

  test("horizon boundary is inclusive (ts == anchor + horizon advances)") {
    assert(funnelH(Seq((1L, 0L, "A"), (1L, 100L, "B")), 100L) ==
      Map(1L -> ((0L, 100L, -1L, 2))))
  }

  test("the anchor is the EARLIEST first step — a later one is never retried") {
    // anchor 0 puts B@120 out of the 100ms horizon even though the
    // second A@50 would admit it (greedy min-after-min semantics)
    assert(funnelH(Seq((1L, 0L, "A"), (1L, 50L, "A"), (1L, 120L, "B")), 100L) ==
      Map(1L -> ((0L, -1L, -1L, 1))))
  }

  test("a large horizon reproduces the unwindowed funnel") {
    val evs = Seq((1L, 10L, "A"), (1L, 20L, "B"), (1L, 30L, "C"))
    assert(funnelH(evs, Long.MaxValue / 2) == funnel(evs))
  }

  test("stateful streaming funnel: per-trigger progress, final state == batch walk") {
    import graft.stream.EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp(min * 60000)
    val steps = Seq("view", "click", "purchase")
    val trigger1 = Seq(
      Event(1, m(1), 1L, "view", 0.0),
      Event(2, m(1), 2L, "click", 0.0)) // before any view: skipped, but first-seen row
    val trigger2 = Seq(
      Event(3, m(2), 1L, "click", 0.0),
      Event(4, m(3), 1L, "purchase", 0.0),
      Event(5, m(5), 2L, "view", 0.0))

    val input = MemoryStream[Event]
    val q = Funnel.statefulProgress(input.toDS(), steps)
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream").start()
    try {
      input.addData(trigger1: _*); q.processAllAvailable()
      val after1 = spark.table("funnel_stream")
        .select("user_id", "stage").as[(Long, Int)].collect().toMap
      assert(after1 == Map(1L -> 1, 2L -> 0)) // both first-seen; user 2 unadvanced
      input.addData(trigger2: _*); q.processAllAvailable()
      val rows = spark.table("funnel_stream").collect()
      assert(rows.length == 4) // each user progressed in trigger 2 -> one more row each

      // last progress row per user equals the batch walk over all events
      val all = (trigger1 ++ trigger2)
      val batch = Funnel.windowFunnel(
        all.map(e => (e.user_id, e.ts.getTime, e.event_type))
          .toDF("user_id", "ts_ms", "event_type"),
        "user_id", "event_type", "ts_ms", steps)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
      val finalRows = spark.table("funnel_stream")
        .withColumn("__r", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("user_id").orderBy(col("stage").desc)))
        .filter(col("__r") === 1)
        .collect().map(r => r.getAs[Long]("user_id") ->
          ((r.getAs[scala.collection.Seq[Long]]("slots").toList, r.getAs[Int]("stage")))).toMap
      assert(finalRows.keySet == batch.keySet)
      finalRows.foreach { case (u, (slots, stage)) =>
        val (t1, t2, t3, bs) = batch(u)
        assert(slots == List(t1, t2, t3) && stage == bs, s"user $u mismatch")
      }
    } finally q.stop()
  }

  test("stateful funnel emits nothing for an unchanged known user") {
    import graft.stream.EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp(min * 60000)
    val input = MemoryStream[Event]
    val q = Funnel.statefulProgress(input.toDS(), Seq("A", "B"))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_stream2").start()
    try {
      input.addData(Event(1, m(1), 1L, "A", 0.0)); q.processAllAvailable()
      // a B at the SAME millisecond cannot advance (strict order) -> no row
      input.addData(Event(2, m(1), 1L, "B", 0.0)); q.processAllAvailable()
      assert(spark.table("funnel_stream2").count() == 1)
    } finally q.stop()
  }
}
