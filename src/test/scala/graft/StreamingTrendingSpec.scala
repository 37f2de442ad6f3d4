package graft

import graft.stream.StreamingTrending
import graft.stream.StreamingTrending.{BucketRow, Interaction}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingTrendingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val H = 100L // half-life ms for the fixtures

  /** Drive the stateful kernel over `slices` triggers, return the
    * freshest (max-seq) bucket vector per item. */
  private def runStream(slices: Seq[Seq[Interaction]], keep: Int): Set[(Long, Long, Long)] = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Interaction]
    val q = StreamingTrending.bucketCountsStream(input.toDS(), H, keep)
      .writeStream.outputMode("append").format("memory")
      .queryName("trend_stream").start()
    try {
      slices.foreach { s => input.addData(s: _*); q.processAllAvailable() }
      val rows = spark.table("trend_stream").as[BucketRow].collect()
      val lastSeq = rows.groupBy(_.item_id).view.mapValues(_.map(_.seq).max).toMap
      rows.filter(r => r.seq == lastSeq(r.item_id))
        .map(r => (r.item_id, r.bucket, r.n)).toSet
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS trend_stream")
    }
  }

  private def runBatch(events: Seq[Interaction], keep: Int): Set[(Long, Long, Long)] =
    StreamingTrending.bucketCountsBatch(
        events.toDF("item_id", "ts"), H, keep)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val events = Seq(
    Interaction(1, 50), Interaction(1, 150), Interaction(1, 155), Interaction(1, 990),
    Interaction(2, 10), Interaction(2, 4210), // item 2's first bucket falls out (keep=3)
    Interaction(3, 700))

  test("stream state == batch bucket counts, single trigger and sliced, keep=3") {
    val batch = runBatch(events, 3)
    assert(runStream(Seq(events), 3) == batch)
    assert(runStream(events.grouped(2).toSeq, 3) == batch, "2-event slices diverge")
    assert(runStream(events.map(Seq(_)), 3) == batch, "1-event slices diverge")
  }

  test("monotone pruning: a late arrival into an already-pruned bucket is dropped by both") {
    // item 9: new bucket 50 first, then a LATE event in bucket 0
    val evs = Seq(Interaction(9, 5000), Interaction(9, 10))
    val batch = runBatch(evs, 3)
    assert(batch == Set((9L, 50L, 1L))) // bucket 0 outside the final window
    assert(runStream(evs.map(Seq(_)), 3) == batch)
    // and in-window late arrivals ARE counted by both
    val evs2 = Seq(Interaction(9, 5000), Interaction(9, 4900))
    assert(runStream(evs2.map(Seq(_)), 3) == runBatch(evs2, 3))
  }

  test("serving: exact power-of-two decay against the global max bucket, top-k cut") {
    // buckets: item 1 -> {0:2, 9:1}; item 2 -> {9:2}; g = 9
    val bc = Seq((1L, 0L, 2L), (1L, 9L, 1L), (2L, 9L, 2L)).toDF("item_id", "bucket", "n")
    val out = StreamingTrending.trendingFromBuckets(bc, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // item 1: 2*(10^6 div 2^9) + 1*10^6 = 2*1953 + 1000000 = 1003906
    // item 2: 2*10^6 = 2000000
    assert(out.toSeq == Seq((2L, 2000000L, 2L), (1L, 1003906L, 3L)))
  }

  test("state stays bounded: an item never retains more than `keep` buckets") {
    val longRun = (0 until 200).map(i => Interaction(7, i * H)) // 200 distinct buckets
    val fin = runStream(longRun.grouped(25).toSeq, 5)
    assert(fin.size == 5)
    assert(fin.map(_._2) == (195L to 199L).toSet)
  }
}
