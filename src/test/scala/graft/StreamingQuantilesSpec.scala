package graft

import graft.stream.StreamingQuantiles
import graft.util.QuantileSketch
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quantile sketch (q206): JVM/SQL bucket parity, stream ==
  * batch under trigger slicing, bounded state, quantile serving. */
class StreamingQuantilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("bucketIdxLong == SQL bucketIdx across signs and power-of-two boundaries") {
    for (s <- Seq(3, 5)) {
      val grid = (Seq(0L, 1L, 2L) ++
        (0 to 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1)) ++
        Seq(Long.MaxValue, 12345L, 999999937L)).distinct
      val vals = (grid ++ grid.map(-_)).distinct.filter(_ != Long.MinValue)
      val sql = vals.toDF("v")
        .withColumn("qb", QuantileSketch.bucketIdx("v", s))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      vals.foreach { v =>
        assert(StreamingQuantiles.bucketIdxLong(v, s) == sql(v),
          s"s=$s v=$v jvm=${StreamingQuantiles.bucketIdxLong(v, s)} sql=${sql(v)}")
      }
    }
  }

  test("stream == batch under two different trigger slicings; state bounded; quantiles serve") {
    val rnd = new scala.util.Random(11)
    val obs = (0 until 3000).map { i =>
      StreamingQuantiles.Obs(s"t${i % 3}", (rnd.nextGaussian() * 5000).toLong + (i % 3) * 1000)
    }
    val batch = StreamingQuantiles.sketchBatch(
      obs.toDF("g", "v"), "g", "v", s = 5)
      .collect().map(_.toString).sorted
    for ((slices, tag) <- Seq(Seq(3000) -> "one", Seq(100, 1400, 1000, 500) -> "four")) {
      val ms = MemoryStream[StreamingQuantiles.Obs]
      val q = StreamingQuantiles.sketchStream(ms.toDS(), s = 5).toDF()
        .writeStream.format("memory").outputMode("append")
        .queryName(s"sq_$tag").start()
      var off = 0
      slices.foreach { n => ms.addData(obs.slice(off, off + n)); off += n; q.processAllAvailable() }
      q.stop()
      // localCheckpoint: latestState self-joins the sink table, and a
      // MemoryPlan self-join trips conflicting-reference resolution
      val latest = StreamingQuantiles.latestState(
          spark.table(s"sq_$tag").localCheckpoint(true))
        .collect().map(_.toString).sorted
      assert(latest.sameElements(batch), s"slicing $tag diverged from batch")
      // bounded state: bucket count per group ≤ the structural bound
      val perGroup = spark.table(s"sq_$tag").groupBy("g", "seq").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(perGroup <= 64L * 32 + 32, s"state not bounded: $perGroup buckets")
    }
    // serving read off the compacted stream state matches the batch read
    val servedBatch = QuantileSketch.quantiles(
      StreamingQuantiles.sketchBatch(obs.toDF("g", "v"), "g", "v", 5),
      Seq("g"), Seq(0.5, 0.95), 5).collect().map(_.toString).sorted
    val servedStream = QuantileSketch.quantiles(
      StreamingQuantiles.latestState(spark.table("sq_four").localCheckpoint(true)),
      Seq("g"), Seq(0.5, 0.95), 5).collect().map(_.toString).sorted
    assert(servedStream.sameElements(servedBatch))
  }
}
