package graft

import graft.stream.StreamingDistinct
import graft.util.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming HLL distinct (q209): JVM/SQL hash+register parity,
  * stream == batch register equality under trigger slicing, bounded
  * state, estimate accuracy on known cardinalities. */
class StreamingDistinctSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("h52Long/idxRhoLong == SQL registers cell-for-cell") {
    val keys = (0 until 500).map(i => s"user_$i") ++ Seq("", "a|b", "日本語", "0")
    for (b <- Seq(4, 6, 9)) {
      val sql = StreamingDistinct.registersBatch(
        keys.toDF("k").withColumn("g", lit("x")), "g", "k", b, 42L)
        .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      val jvm = keys.map(k => StreamingDistinct.idxRhoLong(StreamingDistinct.h52Long(42L, k), b))
        .groupBy(_._1).map { case (idx, xs) => idx -> xs.map(_._2).max }
      assert(jvm == sql, s"b=$b")
    }
  }

  test("stream == batch registers under two trigger slicings; bounded state; estimate sane") {
    val obs = (0 until 4000).map { i =>
      StreamingDistinct.Obs(s"g${i % 3}", s"user_${i % (300 * (i % 3 + 1))}")
    }
    val b = 6
    val batch = StreamingDistinct.registersBatch(
      obs.toDF("g", "k"), "g", "k", b, 42L)
      .collect().map(_.toString).sorted
    for ((slices, tag) <- Seq(Seq(4000) -> "one", Seq(77, 1923, 1500, 500) -> "four")) {
      val ms = MemoryStream[StreamingDistinct.Obs]
      val q = StreamingDistinct.registersStream(ms.toDS(), b, 42L).toDF()
        .writeStream.format("memory").outputMode("append")
        .queryName(s"sd_$tag").start()
      var off = 0
      slices.foreach { n => ms.addData(obs.slice(off, off + n)); off += n; q.processAllAvailable() }
      q.stop()
      val latest = StreamingDistinct.latestState(
          spark.table(s"sd_$tag").localCheckpoint(true))
        .collect().map(_.toString).sorted
      assert(latest.sameElements(batch), s"slicing $tag diverged from batch")
      val perGroup = spark.table(s"sd_$tag").groupBy("g", "seq").count()
        .agg(max("count")).collect()(0).getLong(0)
      assert(perGroup <= (1L << b), s"state not bounded: $perGroup registers")
    }
    // estimates off the stream state match the batch estimates exactly
    // (same registers → same integer algebra) and sit inside the m=64
    // noise envelope (~1.04/√m ≈ 13% σ; allow ~2.7σ on the pinned seed)
    val est = StreamingDistinct.estimates(
      StreamingDistinct.latestState(spark.table("sd_four").localCheckpoint(true)), b)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    val estBatch = StreamingDistinct.estimates(
      StreamingDistinct.registersBatch(obs.toDF("g", "k"), "g", "k", b, 42L), b)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(est == estBatch)
    val truth = obs.groupBy(_.g).map { case (g, xs) => g -> xs.map(_.k).distinct.size }
    truth.foreach { case (g, n) =>
      val e = est(g) / 1e6
      assert(math.abs(e - n) / n < 0.35, s"$g: est $e vs true $n")
    }
  }

  test("null keys are ignored on both forms") {
    val df = Seq(("a", "x"), ("a", null), ("a", "y")).toDF("g", "k")
    val regs = StreamingDistinct.registersBatch(df, "g", "k", 4, 42L)
    assert(regs.count() <= 2)
    val ms = MemoryStream[StreamingDistinct.Obs]
    val q = StreamingDistinct.registersStream(ms.toDS(), 4, 42L).toDF()
      .writeStream.format("memory").outputMode("append")
      .queryName("sd_null").start()
    ms.addData(Seq(StreamingDistinct.Obs("a", "x"),
      StreamingDistinct.Obs("a", null), StreamingDistinct.Obs("a", "y")))
    q.processAllAvailable(); q.stop()
    val latest = StreamingDistinct.latestState(
      spark.table("sd_null").localCheckpoint(true))
      .collect().map(_.toString).sorted
    assert(latest.sameElements(regs.collect().map(_.toString).sorted))
  }
}
