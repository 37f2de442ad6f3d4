package graft

import graft.stream.{StreamingCms, StreamingDistinct}
import graft.util.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming CMS (q212): JVM/SQL counter-cell parity, stream == batch
  * counters under trigger slicing, bounded state, the overestimate
  * guarantee off the stream state. */
class StreamingCmsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val depth = 4
  private val width = 32
  private val seed = 7L

  test("JVM hash == SQL cmsCounters cells (counts and placement)") {
    val keys = (0 until 300).map(i => s"k${i % 37}")
    val batch = StreamingCms.countersBatch(keys.toDF("k"), Seq("k"), depth, width, seed)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val jvm = keys.flatMap(k => (0 until depth).map(j =>
        (j, java.lang.Long.remainderUnsigned(
          StreamingDistinct.h52Long(seed, s"$k|$j"), width.toLong))))
      .groupBy(identity).map { case (cell, xs) => cell -> xs.size.toLong }
    assert(jvm == batch)
  }

  test("stream == batch counters under two trigger slicings; bounded state; overestimate holds") {
    val rnd = new scala.util.Random(3)
    val keys = (0 until 5000).map(_ => s"u${math.abs(rnd.nextInt(400))}")
    val batch = StreamingCms.countersBatch(keys.toDF("k"), Seq("k"), depth, width, seed)
      .collect().map(_.toString).sorted
    for ((slices, tag) <- Seq(Seq(5000) -> "one", Seq(13, 2987, 1500, 500) -> "four")) {
      val ms = MemoryStream[StreamingCms.Obs]
      val q = StreamingCms.countersStream(ms.toDS(), width, seed).toDF()
        .writeStream.format("memory").outputMode("append")
        .queryName(s"cms_$tag").start()
      var off = 0
      slices.foreach { n =>
        ms.addData(keys.slice(off, off + n).flatMap(k =>
          (0 until depth).map(j => StreamingCms.Obs(j, k, 1L))))
        off += n; q.processAllAvailable()
      }
      q.stop()
      val latest = StreamingCms.latestState(
          spark.table(s"cms_$tag").localCheckpoint(true))
        .collect().map(_.toString).sorted
      assert(latest.sameElements(batch), s"slicing $tag diverged from batch")
      val perRow = spark.table(s"cms_$tag").groupBy("row", "seq").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(perRow <= width.toLong, s"state not bounded: $perRow counters")
    }
    // estimates off the stream state: est >= true count for every key
    val truth = keys.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val est = StreamingCms.estimates(
      StreamingCms.latestState(spark.table("cms_four").localCheckpoint(true)),
      truth.keys.toSeq.toDF("k"), Seq("k"), depth, width, seed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k: est ${est(k)} below true $n")
    }
    // and equals the batch estimates exactly (same counters)
    val estBatch = Sketches.cmsEstimate(
      StreamingCms.countersBatch(keys.toDF("k"), Seq("k"), depth, width, seed),
      truth.keys.toSeq.toDF("k"), Seq("k"), depth, width, seed)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == estBatch)
  }

  test("null keys are dropped by BOTH forms (stream == batch holds through a null)") {
    val batch = StreamingCms.countersBatch(
      Seq(Some("a"), None, Some("b")).toDF("k"), Seq("k"), depth, width, seed)
      .collect().map(_.toString).sorted
    val ms = MemoryStream[StreamingCms.Obs]
    val q = StreamingCms.countersStream(ms.toDS(), width, seed).toDF()
      .writeStream.format("memory").outputMode("append")
      .queryName("cms_null").start()
    ms.addData((0 until depth).flatMap(j =>
      Seq(StreamingCms.Obs(j, "a", 1L), StreamingCms.Obs(j, null, 1L),
        StreamingCms.Obs(j, "b", 1L))))
    q.processAllAvailable(); q.stop()
    val latest = StreamingCms.latestState(
      spark.table("cms_null").localCheckpoint(true))
      .collect().map(_.toString).sorted
    assert(latest.sameElements(batch))
  }

  test("weights accumulate (weighted fan-out)") {
    val ms = MemoryStream[StreamingCms.Obs]
    val q = StreamingCms.countersStream(ms.toDS(), width, seed).toDF()
      .writeStream.format("memory").outputMode("append")
      .queryName("cms_w").start()
    ms.addData((0 until depth).map(j => StreamingCms.Obs(j, "hot", 5L)))
    ms.addData((0 until depth).map(j => StreamingCms.Obs(j, "hot", 2L)))
    q.processAllAvailable(); q.stop()
    val est = StreamingCms.estimates(
      StreamingCms.latestState(spark.table("cms_w").localCheckpoint(true)),
      Seq("hot").toDF("k"), Seq("k"), depth, width, seed)
      .collect()(0).getLong(1)
    assert(est == 7L)
  }
}
