package graft

import graft.util.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.util.QuantileSketch]] (q189): integer-bucket invariants,
  * the DDSketch relative-error bound, and merge/refresh invariance —
  * the property that makes the sketch the incremental-agg family's
  * quantile member. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val S = 5 // sub-bits; relative error bound 2^-5

  test("bucket/rep invariants over random signed longs") {
    val rnd = new scala.util.Random(11)
    val vs = (Seq(0L, 1L, 31L, 32L, 33L, 63L, 64L, 65L, -1L, -31L, -32L,
      -100000L, (1L << 40) - 1, 1L << 40) ++
      Seq.fill(3000)(rnd.nextLong() % 1000000000000L)).distinct
    val rows = vs.toDF("v")
      .withColumn("qb", QuantileSketch.bucketIdx("v", S))
      .withColumn("rep", QuantileSketch.repValue("qb", S))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // monotone: sorting by v sorts qb
    val sorted = rows.sortBy(_._1)
    assert(sorted.map(_._2).sliding(2).forall(p => p.head <= p.last),
      "bucket index not monotone in v")
    rows.foreach { case (v, qb, rep) =>
      if (math.abs(v) < (1L << S)) {
        assert(qb == (if (v >= 0) v else -1L - (-v)), s"singleton bucket of $v")
        assert(rep == v, s"singleton rep of $v")
      } else {
        // rep errs away from zero, within 2^-s relative
        assert(math.abs(rep) >= math.abs(v), s"rep $rep under |v| for $v")
        assert(math.abs(rep) <= math.abs(v) * (1.0 + 1.0 / (1L << S)) + 1,
          s"rep $rep beyond the 2^-$S bound for $v")
        assert((rep >= 0) == (v >= 0), s"rep sign flip for $v")
      }
    }
  }

  test("merge invariance: any sharding yields the identical state and quantiles") {
    val rnd = new scala.util.Random(3)
    val data = Seq.tabulate(5000)(i =>
      (s"g${i % 3}", (math.exp(rnd.nextGaussian() * 3 + 5)).toLong - 20))
      .toDF("g", "v")
    val whole = QuantileSketch.state(data, Seq("g"), "v", S)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    for (nShards <- Seq(2, 5, 7)) {
      // shard by value hash — groups straddle shards
      val parts = (0 until nShards).map(k =>
        QuantileSketch.state(data.filter(abs(hash(col("v"))) % nShards === k),
          Seq("g"), "v", S))
      val merged = QuantileSketch.merge(parts, Seq("g"))
      assert(rows(merged) == rows(whole), s"state drift at $nShards shards")
    }
    // refresh == from-scratch
    val half1 = data.filter(col("v") % 2 === 0)
    val half2 = data.filter(col("v") % 2 =!= 0)
    val refreshed = QuantileSketch.refresh(
      QuantileSketch.state(half1, Seq("g"), "v", S), half2, Seq("g"), "v", S)
    assert(rows(refreshed) == rows(whole))
  }

  test("quantile estimates stay within the 2^-s relative bound of exact nearest-rank") {
    val rnd = new scala.util.Random(9)
    val vals = Seq.fill(20000)((math.exp(rnd.nextGaussian() * 2 + 6)).toLong)
    val data = vals.map(("g", _)).toDF("g", "v")
    val qs = Seq(0.5, 0.9, 0.99)
    val est = QuantileSketch.quantiles(
      QuantileSketch.state(data, Seq("g"), "v", S), Seq("g"), qs, S)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    val sortedVals = vals.sorted
    qs.foreach { q =>
      val exact = sortedVals((math.floor(q * (vals.size - 1)) + 1).toInt - 1)
      val e = est(q)
      assert(e >= exact, s"q=$q estimate $e below exact rank value $exact")
      assert(e <= exact * (1.0 + 1.0 / (1L << S)) + 1,
        s"q=$q estimate $e beyond bound around $exact")
    }
  }

  test("sketch winsorize: bounds within the 2^-s band of exact quantiles, NULLs stay NULL") {
    val rnd = new scala.util.Random(21)
    val vals = Seq.fill(4000)((math.exp(rnd.nextGaussian() * 2 + 6)).toLong)
    val data = (vals.map(v => ("g", Some(v))) :+ (("g", None: Option[Long])))
      .toDF("g", "v")
    val out = QuantileSketch.winsorizeByGroup(data, Seq("g"), "v", 0.05, 0.95, S)
      .cache()
    val sorted = vals.sorted
    def exactRank(q: Double) = sorted((math.floor(q * (vals.size - 1)) + 1).toInt - 1)
    val bounds = out.select("v_lo", "v_hi").first()
    for ((got, q) <- Seq((bounds.getLong(0), 0.05), (bounds.getLong(1), 0.95))) {
      val exact = exactRank(q)
      assert(got >= exact && got <= exact * (1.0 + 1.0 / (1L << S)) + 1,
        s"q=$q sketch bound $got outside the band around $exact")
    }
    // clip actually bites on both tails and respects the bounds
    val ws = out.filter(col("v").isNotNull).select("v", "v_w").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ws.forall { case (_, w) => w >= bounds.getLong(0) && w <= bounds.getLong(1) })
    assert(ws.exists { case (v, w) => v < w } && ws.exists { case (v, w) => v > w })
    // NULL value -> NULL clipped (the r12 ADVICE contract)
    assert(out.filter(col("v").isNull).first().isNullAt(4))
    out.unpersist()
  }

  test("streaming form: complete-mode bucket counts == batch state after every trigger") {
    // the sketch state is a plain grouped count over the bucket index,
    // so its streaming form is a stock aggregation with BOUNDED state
    // (≤ occupied buckets per group — the sketch's point); complete
    // mode re-emits the whole (small) table each trigger
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val q = input.toDF().toDF("g", "v")
      .withColumn("qb", QuantileSketch.bucketIdx("v", S))
      .groupBy("g", "qb").agg(count(lit(1)).as("cnt"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("qsk_stream").start()
    try {
      val rnd = new scala.util.Random(4)
      var delivered = Seq.empty[(String, Long)]
      for (batch <- Seq.fill(3)(Seq.fill(400)(
        (s"g${rnd.nextInt(2)}", (math.exp(rnd.nextGaussian() * 3 + 4)).toLong)))) {
        input.addData(batch: _*)
        q.processAllAvailable()
        delivered ++= batch
        val got = spark.table("qsk_stream").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        val want = QuantileSketch.state(delivered.toDF("g", "v"), Seq("g"), "v", S)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
        assert(got == want, s"stream/batch drift after ${delivered.size} rows")
      }
    } finally { q.stop(); spark.sql("DROP TABLE IF EXISTS qsk_stream") }
  }

  test("NULL values carry no rank; state stays bounded per group") {
    val data = Seq(("a", Some(5L)), ("a", None), ("a", Some(1000000L)),
      ("b", None)).toDF("g", "v")
    val st = QuantileSketch.state(data, Seq("g"), "v", S)
    assert(st.filter(col("g") === "b").isEmpty)
    assert(st.filter(col("g") === "a").count() == 2)
    val qs = QuantileSketch.quantiles(st, Seq("g"), Seq(0.0, 1.0), S)
      .collect().map(r => r.getDouble(1) -> r.getLong(2)).toMap
    assert(qs(0.0) == 5L)
  }
}
