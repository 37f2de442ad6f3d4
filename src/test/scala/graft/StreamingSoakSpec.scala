package graft

import graft.stream.{EventStreams, StreamingDedup, StreamingUpsert}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.scalatest.funsuite.AnyFunSuite

/** Multi-trigger soak tests for the three stateful streaming kernels.
  *
  * The single-trigger specs in [[StreamingAndPipelineSpec]] and
  * [[LineAndStreamDedupSpec]] prove stream == batch on ordered feeds;
  * these runs push ≥3 triggers with out-of-order and duplicate
  * deliveries through each kernel and, after EVERY trigger, assert
  * both output parity with the batch operator over the data delivered
  * so far AND a state bound from the state-store metrics — state rows
  * must equal (never exceed) the number of live keys/buckets, i.e.
  * state is bounded by key cardinality, not by rows ingested. For the
  * as-of kernel the watermark-eviction contract (history below the
  * horizon compacts to one floor row) is additionally checked against
  * the raw state via the state data source reader.
  */
class StreamingSoakSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** numRowsTotal of the last reported stateful-operator progress. */
  private def stateRows(q: StreamingQuery): Long =
    q.recentProgress.flatMap(_.stateOperators).lastOption
      .map(_.numRowsTotal).getOrElse(-1L)

  test("soak: StreamingUpsert over 4 triggers — stale/dup swallowed, state == distinct keys") {
    import StreamingUpsert.Versioned
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val t1 = Seq(Versioned(1, 1, "a1"), Versioned(2, 1, "b1"), Versioned(3, 2, "c2"),
      Versioned(4, 1, "d1"))
    // out-of-order: stale versions for 1 and 3 (swallowed), advance 2 and 4
    val t2 = Seq(Versioned(2, 3, "b3"), Versioned(1, 0, "a0"), Versioned(3, 1, "c1"),
      Versioned(4, 2, "d2"))
    // duplicate redelivery of t2's winners + an equal-version lower fp: all swallowed
    val t3 = Seq(Versioned(2, 3, "b3"), Versioned(4, 2, "d2"), Versioned(2, 3, "b0"))
    // new key 5, tie on key 1 resolved by fp bytes, advance 3
    val t4 = Seq(Versioned(5, 1, "e1"), Versioned(1, 1, "a9"), Versioned(3, 5, "c5"))
    val triggers = Seq(t1, t2, t3, t4)

    val input = MemoryStream[Versioned]
    val q = StreamingUpsert.compactStream(input.toDS())
      .writeStream.outputMode("append").format("memory").queryName("soak_upsert").start()
    try {
      var delivered = Seq.empty[Versioned]
      var emittedBefore = 0L
      triggers.zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch

        // replaying the emitted change log last-write-per-key must equal
        // the batch compaction of everything delivered so far
        val log = spark.table("soak_upsert").as[Versioned].collect()
        val replay = log.zipWithIndex
          .groupBy(_._1.key).map { case (_, vs) => vs.maxBy(_._2)._1 }
          .map(v => (v.key, v.version, v.fp)).toSet
        val batchCompact = graft.util.Upsert.compact(
            Seq(delivered.toDF()), "key", Seq("version", "fp"))
          .as[Versioned].collect().map(v => (v.key, v.version, v.fp)).toSet
        assert(replay == batchCompact,
          s"trigger ${i + 1}: log replay $replay != batch compaction $batchCompact")

        // state is one row per distinct key ever seen — never per update
        val keys = delivered.map(_.key).distinct.size.toLong
        assert(stateRows(q) == keys,
          s"trigger ${i + 1}: state rows ${stateRows(q)} != $keys live keys")

        // swallow check: the all-stale/duplicate trigger 3 emits nothing
        val emittedNow = spark.table("soak_upsert").count()
        if (i == 2) assert(emittedNow == emittedBefore,
          s"trigger 3 (stale+dup only) emitted ${emittedNow - emittedBefore} rows")
        emittedBefore = emittedNow
      }
    } finally q.stop()
  }

  test("soak: StreamingDedup over 3 triggers — redelivery tolerated, state == occupied buckets") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def doc(id: Long, text: String) = (id, text)
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val t1 = Seq(doc(1, base), doc(2, base + " tail"), doc(3, "completely different words " +
      "about graph embeddings and spark execution plans at scale"))
    // doc_id order across triggers (the kernel's stated feed contract) +
    // a redelivery of doc 2 (same id, same text) inside the trigger
    val t2 = Seq(doc(4, base), doc(2, base + " tail"), doc(5, "completely different words " +
      "about graph embeddings and spark execution plans at scale today"))
    val t3 = Seq(doc(6, base + " tail"), doc(1, base)) // redeliver the anchor itself
    val triggers = Seq(t1, t2, t3)
    val nBands = 4; val shingleK = 3

    val input = MemoryStream[(Long, String)]
    val q = StreamingDedup.candidatePairs(
        StreamingDedup.bucketed(input.toDF().toDF("doc_id", "text"), nBands, shingleK)
          .as[StreamingDedup.BucketedDoc])
      .writeStream.outputMode("append").format("memory").queryName("soak_dedup").start()
    try {
      var delivered = Seq.empty[(Long, String)]
      triggers.zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered = (delivered ++ batch).distinct // id-order feed, dups collapse

        // emitted pairs as a SET == the relational batch anchor pairs
        // over everything delivered so far (redeliveries emit the same
        // pair again — candidate streams are at-least-once by contract)
        val streamed = spark.table("soak_dedup")
          .select("doc_a", "doc_b", "b").as[(Long, Long, Int)].collect().toSet
        val batchPairs = graft.text.Dedup.lshAnchorPairs(
            delivered.toDF("doc_id", "text"), nBands, shingleK)
          .select("doc_a", "doc_b", "b").as[(Long, Long, Int)].collect().toSet
        assert(streamed == batchPairs,
          s"trigger ${i + 1}: stream $streamed != batch $batchPairs")

        // state is one long per OCCUPIED bucket — bounded by bucket
        // cardinality, not docs ingested (6 docs × 4 bands ≥ buckets)
        val buckets = StreamingDedup.bucketed(
            delivered.toDF("doc_id", "text"), nBands, shingleK)
          .select("bucket").distinct().count()
        assert(stateRows(q) == buckets,
          s"trigger ${i + 1}: state rows ${stateRows(q)} != $buckets occupied buckets")
      }
    } finally q.stop()
  }

  test("soak: stateful funnel over 4 triggers — dups no-op, rejects emit nothing, state == users") {
    import EventStreams.Event
    import graft.stream.Funnel
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp(min * 60000)
    val steps = Seq("view", "click", "purchase")

    val t1 = Seq( // out of order WITHIN the trigger (the kernel sorts)
      Event(1, m(1), 1L, "view", 0.0),
      Event(2, m(0), 1L, "click", 0.0)) // before any view: skipped
    val t2 = Seq(
      Event(3, m(5), 1L, "click", 0.0),
      Event(4, m(3), 2L, "view", 0.0),
      Event(1, m(1), 1L, "view", 0.0)) // dup of a SET slot: no-op
    val t3 = Seq( // nothing can advance: dup + a click predating user 2's view
      Event(3, m(5), 1L, "click", 0.0),
      Event(5, m(2), 2L, "click", 0.0))
    val t4 = Seq(
      Event(6, m(9), 1L, "purchase", 0.0),
      Event(7, m(7), 2L, "click", 0.0))
    val triggers = Seq(t1, t2, t3, t4)

    val input = MemoryStream[Event]
    val q = Funnel.statefulProgress(input.toDS(), steps)
      .writeStream.outputMode("append").format("memory").queryName("soak_funnel").start()
    try {
      var delivered = Seq.empty[Event]
      var emittedBefore = 0L
      triggers.zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch

        // latest snapshot per user (slots are monotone, so max stage
        // with first-seen fallback = the last emission) == the batch
        // walk over everything delivered so far, duplicates INCLUDED
        // (batch is idempotent to them the same way the state is)
        val latest = spark.table("soak_funnel")
          .groupBy("user_id").agg(max(struct(col("stage"), col("slots"))).as("s"))
          .select(col("user_id"), col("s.slots"), col("s.stage"))
          .as[(Long, Seq[Long], Int)].collect()
          .map(r => r._1 -> ((r._2, r._3))).toMap
        val batchWalk = Funnel.windowFunnel(
          delivered.map(e => (e.user_id, e.ts.getTime, e.event_type))
            .toDF("user_id", "ts_ms", "event_type"),
          "user_id", "event_type", "ts_ms", steps)
          .collect()
          .map(r => r.getLong(0) -> ((Seq(r.getLong(1), r.getLong(2), r.getLong(3)), r.getInt(4))))
          .toMap
        assert(latest == batchWalk, s"trigger ${i + 1}: $latest != $batchWalk")

        // state: one k-slot row per user ever seen
        val users = delivered.map(_.user_id).distinct.size.toLong
        assert(stateRows(q) == users,
          s"trigger ${i + 1}: state rows ${stateRows(q)} != $users users")

        // the all-noop trigger 3 emits nothing
        val emittedNow = spark.table("soak_funnel").count()
        if (i == 2) assert(emittedNow == emittedBefore,
          s"trigger 3 (dup + pre-view click) emitted ${emittedNow - emittedBefore} rows")
        emittedBefore = emittedNow
      }
    } finally q.stop()
  }

  test("soak: asofEnrich over 4 triggers — out-of-order, dup rights, horizon-bounded state") {
    import EventStreams.Event
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def m(min: Long) = new java.sql.Timestamp((1000 + min) * 60000)

    // 30-min watermark. Rights always delivered no later than the lefts
    // that need them (the kernel's append-mode contract); order WITHIN a
    // trigger shuffled.
    val t1 = Seq(
      Event(101, m(5), 1L, "click", 0.0),
      Event(1, m(0), 1L, "purchase", 1.0),
      Event(2, m(4), 1L, "purchase", 2.0),
      Event(3, m(2), 2L, "purchase", 3.0),
      Event(102, m(6), 2L, "click", 0.0))
    val t2 = Seq( // dup right 2 redelivered; late-but-in-horizon left for user 2
      Event(2, m(4), 1L, "purchase", 2.0),
      Event(103, m(20), 1L, "click", 0.0),
      Event(104, m(7), 2L, "click", 0.0))
    val t3 = Seq( // jump event time +5h -> watermark advances far past t1/t2
      Event(4, m(300), 1L, "purchase", 4.0),
      Event(105, m(301), 1L, "click", 0.0),
      Event(106, m(302), 2L, "click", 0.0)) // user 2: floor row answers
    val t4 = Seq( // post-eviction trigger: floor row must still answer
      Event(107, m(305), 2L, "click", 0.0),
      Event(108, m(306), 1L, "click", 0.0))
    val triggers = Seq(t1, t2, t3, t4)

    val ckpt = java.nio.file.Files.createTempDirectory("graft_soak_asof").toString
    val input = MemoryStream[Event]
    val q = EventStreams.asofEnrich(
        input.toDS().withWatermark("ts", "30 minutes"), "click", "purchase")
      .writeStream.outputMode("append").format("memory").queryName("soak_asof")
      .option("checkpointLocation", ckpt).start()
    try {
      var delivered = Seq.empty[Event]
      triggers.zipWithIndex.foreach { case (batch, i) =>
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch

        // parity with the batch as-of join over all events so far
        // (dedup the redelivered right for the batch side — the buffer
        // tolerates the dup because matching picks by (ts, id) order)
        val all = delivered.distinct.toDS()
        val expected = graft.util.AsofJoin.asofBackward(
            all.filter(col("event_type") === "click").toDF(),
            all.filter(col("event_type") === "purchase").toDF(),
            Seq("user_id"), "ts", "ts", Seq("event_id", "value"), "event_id")
          .select(col("event_id"), col("asof_event_id"))
          .as[(Long, Option[Long])].collect().toMap
        val streamed = spark.table("soak_asof")
          .select(col("event_id"), col("asof_event_id"))
          .as[(Long, Option[Long])].collect().toMap
        assert(streamed == expected,
          s"trigger ${i + 1}: stream $streamed != batch $expected")

        // state rows == users that have ever had a right (both users by t1)
        assert(stateRows(q) == 2L,
          s"trigger ${i + 1}: state rows ${stateRows(q)} != 2 keyed users")
      }

      // Raw state audit via the state data source: after t4 ran with the
      // t3-advanced watermark (m(270)), every pre-jump right (ts ≤ m(4))
      // must have compacted to ONE floor row per user — user 1 keeps
      // {floor(2), 4}, user 2 keeps {floor(3)} — state is horizon-
      // bounded, not history-bounded.
      val state = spark.read.format("statestore").load(ckpt)
        .selectExpr("key.value AS user_id", "value.groupState.rights AS rights")
        .as[(Long, Seq[(Long, Long, Double)])].collect().toMap
      assert(state.keySet == Set(1L, 2L))
      assert(state(1L).map(_._2).sorted == Seq(2L, 4L),
        s"user 1 state ${state(1L)} != floor row 2 + in-horizon row 4")
      assert(state(2L).map(_._2) == Seq(3L),
        s"user 2 state ${state(2L)} != single floor row 3")
    } finally q.stop()
  }
}
