package graft

import graft.stream.{EventStreams, SessionFunnelTrending, StreamingTrending}
import graft.stream.StreamingTrending.BucketRow
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Soak for the COMPOSED streaming pipeline (r11 verdict item 7):
  * sessionize → session-count funnel → trending chained as THREE
  * flatMapGroupsWithState operators in ONE streaming query (all
  * append mode — the only combination Spark's
  * UnsupportedOperationChecker admits), pinned equal to the
  * SQL-replayable batch form (q175's kernel) under several trigger
  * slicings.
  *
  * Harness notes: the final sessions only emit when the watermark
  * passes end+gap, so a sentinel user (id 99) cranks the watermark in
  * two closing triggers; it is filtered out between the first and
  * second kernel (a stateless filter between stateful operators) and
  * excluded from the batch side — it exists purely to advance event
  * time. Events are fed in timestamp order across triggers (the
  * funnel ordinal is an arrival-order fold, the same contract the
  * isolated kernels' soak specs use). */
class SessionFunnelTrendingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val GapMs = 30 * 60000L
  private val H = 10 * 60000L // 10-minute half-life
  private val Keep = 41

  private def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)
  private def ev(id: Long, min: Long, user: Long) =
    EventStreams.Event(id, m(min), user, "click", 1.0)

  // u1: three sessions (ends m5, m62, m120); u2: two (m10, m100);
  // u3: two (m0, m200) — stages 1/2/3 all populated. GLOBALLY sorted
  // by ts: sliced triggers must respect event-time order or the
  // source watermark (not the chain) drops the stragglers as late
  private val realEvents = Seq(
    ev(1, 0, 1), ev(2, 5, 1), ev(3, 60, 1), ev(4, 62, 1), ev(5, 120, 1),
    ev(6, 10, 2), ev(7, 100, 2),
    ev(8, 0, 3), ev(9, 200, 3)).sortBy(e => (e.ts.getTime, e.event_id))

  /** Run the 3-kernel chain over `slices` + the sentinel flush, return
    * the freshest bucket vector per stage. */
  private def runComposed(slices: Seq[Seq[EventStreams.Event]]): Set[(Long, Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the checker conservatively rejects ANY stateful op downstream of
    // fMGWS (session rows emitted at timeout are "late" vs the global
    // watermark). Sound to disable for THIS chain: the downstream
    // kernels are event-time-free — NoTimeout state, no watermark
    // filtering — so a late row can never be dropped by them; the
    // equality these tests pin is exactly the guarantee the check
    // cannot see. Restored in the finally.
    val prev = spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(
      input.toDS().withWatermark("ts", "10 minutes"), GapMs)
    val buckets = StreamingTrending.bucketCountsStream(
      SessionFunnelTrending.sessionMilestones(
        sessions.filter(_.user_id != 99L), maxStage = 3), H, Keep)
    val q = buckets.writeStream.outputMode("append").format("memory")
      .queryName("sft_stream").start()
    try {
      slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      // watermark cranks: first advances past every real end+gap, the
      // second runs the batch in which those timers actually fire
      input.addData(ev(9001, 500, 99)); q.processAllAvailable()
      input.addData(ev(9002, 600, 99)); q.processAllAvailable()
      val rows = spark.table("sft_stream").as[BucketRow].collect()
      val lastSeq = rows.groupBy(_.item_id).view.mapValues(_.map(_.seq).max).toMap
      rows.filter(r => r.seq == lastSeq(r.item_id))
        .map(r => (r.item_id, r.bucket, r.n)).toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS sft_stream")
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
      }
    }
  }

  private def batchBuckets: Set[(Long, Long, Long)] =
    StreamingTrending.bucketCountsBatch(
        EventStreams.sessionizeBatch(realEvents.toDS().toDF(), GapMs)
          .select(least(col("session_id"), lit(3L)).as("item_id"),
            col("session_end").as("ts")),
        H, Keep)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("three chained stateful operators in one query == the batch form, any slicing") {
    val want = batchBuckets
    assert(want.map(_._1) == Set(1L, 2L, 3L), s"fixture must populate all stages: $want")
    assert(runComposed(Seq(realEvents)) == want, "single trigger diverged")
    assert(runComposed(realEvents.grouped(3).toSeq) == want, "3-event slices diverged")
    assert(runComposed(realEvents.map(Seq(_))) == want, "1-event slices diverged")
  }

  test("state stays bounded across all three operators (soak metric check)") {
    // total state rows = open sessions (≤ live users) + funnel
    // counters (one long per user ever seen) + trending buckets
    // (≤ keep per stage) — asserted from the state-store metrics of
    // the final trigger, the StreamingSoakSpec discipline
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val input = MemoryStream[EventStreams.Event]
    val q = StreamingTrending.bucketCountsStream(
      SessionFunnelTrending.sessionMilestones(
        EventStreams.sessionize(
          input.toDS().withWatermark("ts", "10 minutes"), GapMs)
          .filter(_.user_id != 99L), maxStage = 3), H, Keep)
      .writeStream.outputMode("append").format("memory")
      .queryName("sft_state").start()
    try {
      realEvents.grouped(3).foreach { s => input.addData(s: _*); q.processAllAvailable() }
      input.addData(ev(9001, 500, 99)); q.processAllAvailable()
      input.addData(ev(9002, 600, 99)); q.processAllAvailable()
      val ops = q.recentProgress.flatMap(_.stateOperators).takeRight(3)
      val total = ops.map(_.numRowsTotal).sum
      // 4 users' funnel counters (3 real + sentinel never reaches op 2:
      // filtered — so 3) + ≤1 open session (sentinel's) + stage buckets
      val bound = 1L + 3L + 3L * Keep
      assert(total > 0 && total <= bound, s"state rows $total above bound $bound")
    } finally {
      q.stop(); spark.sql("DROP TABLE IF EXISTS sft_state")
      prev match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.statefulOperator.checkCorrectness.enabled")
      }
    }
  }

  test("the served trending refresh matches the q175 batch kernel end-to-end") {
    val fromStream = StreamingTrending.trendingFromBuckets(
        runComposed(realEvents.grouped(4).toSeq).toSeq.toDF("item_id", "bucket", "n"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val fromBatch = SessionFunnelTrending.batch(realEvents.toDS().toDF(),
        GapMs, 3, H, Keep, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(fromStream.nonEmpty && fromStream == fromBatch)
  }
}
