package graft

import graft.util.ScaleJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without an Exchange (co-located join)") {
    val a = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "vb")
    ScaleJoins.writeBucketed(a, "bkt_a", "k", 8)
    ScaleJoins.writeBucketed(b, "bkt_b", "k", 8)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    // disable broadcast so the co-location (not a broadcast) removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == a.join(b, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("hash-Bernoulli sampling: deterministic, rate-accurate, class-preserving") {
    import graft.util.Sampling
    val df = (1L to 10000L).map(i => (i, if (i % 100 == 0) 1 else 0)).toDF("id", "label")
    val kept = Sampling.bernoulli(df, 0.5, 42L, Seq("id"))
    val n = kept.count()
    assert(math.abs(n - 5000L) < 300, s"expected ~5000 of 10000 at keep=0.5, got $n")
    // pure function of (key, seed): same call -> identical membership
    assert(Sampling.bernoulli(df, 0.5, 42L, Seq("id")).collect().toSet == kept.collect().toSet)
    // different seed -> different membership (overwhelmingly)
    assert(Sampling.bernoulli(df, 0.5, 43L, Seq("id")).collect().toSet != kept.collect().toSet)
    // class downsample keeps EVERY positive, samples only negatives
    val ds = Sampling.downsampleClass(df, "label", 0, 0.25, 7L, Seq("id"))
    assert(ds.filter($"label" === 1).count() == 100)
    val negs = ds.filter($"label" === 0).count()
    assert(math.abs(negs - 2475L) < 250, s"expected ~2475 negatives at keep=0.25, got $negs")
  }

  test("salted join equals the plain join and spreads hot keys") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong % 100, i))
      .toDF("k", "v") // key 1 is hot
    val dim = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(dim, "k")
    val salted = ScaleJoins.saltedJoin(big, dim, "k", 4)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect().toSet ==
      plain.groupBy("k").count().collect().toSet)
  }

  // ---- bin-bucketed range join ---------------------------------------

  private def rndRange(seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // negative axis values included on purpose: `div` truncation toward
    // zero is monotone there too, and the filter stays exact
    val points = (1 to 800).map(i =>
      (i.toLong, rnd.nextLong(4001) - 2000L)).toDF("p_id", "ts")
    val intervals = (1 to 300).map { i =>
      val s = rnd.nextLong(4001) - 2000L
      // ~1/10 inverted intervals (end < start): must match nothing
      val e = if (i % 10 == 0) s - 1 - rnd.nextLong(20) else s + rnd.nextLong(60)
      (i.toLong, s, e)
    }.toDF("i_id", "lo", "hi")
    (points, intervals)
  }

  test("rangeJoin: binned equi-join == BETWEEN theta-join, every bin width") {
    import graft.util.RangeJoin
    val (points, intervals) = rndRange(3)
    val want = points.join(intervals,
        $"ts" >= $"lo" && $"ts" <= $"hi")
      .select("p_id", "i_id").collect().toSet
    assert(want.nonEmpty)
    for (bw <- Seq(1L, 7L, 64L, 100000L)) {
      val got = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", bw)
        .select("p_id", "i_id").collect().toSet
      assert(got == want, s"binWidth=$bw")
      // exactly-once: no dedup stage, so no pair may appear twice
      val n = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", bw).count()
      assert(n == want.size.toLong, s"duplicate matches at binWidth=$bw")
    }
  }

  test("rangeJoin: plans as a shuffled equi-join, never a nested-loop cartesian") {
    import graft.util.RangeJoin
    val (points, intervals) = rndRange(5)
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = RangeJoin.pointInInterval(points, "ts", intervals, "lo", "hi", 16L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
        s"range join fell back to a product plan:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join on the bin key:\n$plan")
      // the naive BETWEEN formulation IS the product plan — the operator
      // exists because of this
      val naive = points.join(intervals, $"ts" >= $"lo" && $"ts" <= $"hi")
        .queryExecution.executedPlan.toString
      assert(naive.contains("BroadcastNestedLoopJoin") || naive.contains("CartesianProduct"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("AQE splits the hot partition of a skewed shuffle join (the documented escape hatch)") {
    // the scale-notes' standing claim "hot keys are AQE's skew-join
    // case" made executable: one key holds ~half the rows; with the
    // skew thresholds scaled down to test size, the final adaptive plan
    // must mark the shuffle read as skewed (split into sub-partitions)
    val big = spark.range(200000).select(
      when(col("id") % 2 === 0, 1L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("v"))
    val right = spark.range(100000).select(
      when(col("id") % 2 === 0, 1L).otherwise(pmod(col("id"), lit(1000L))).as("k"),
      col("id").as("w"))
    val prior = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.get(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    try {
      // NOTE: a groupBy on the join key downstream would VETO the skew
      // split (it would invalidate the hash partitioning the agg needs)
      // — itself a fact worth knowing; aggregate keylessly instead
      val j = big.join(right, "k").agg(count(lit(1)).as("n"), sum("v").as("s"))
      j.collect() // AQE finalizes the plan only on execution
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skewed"), s"no skewed shuffle read in:\n$plan")
      assert(plan.contains("AQEShuffleRead"), s"not an adaptive plan:\n$plan")
    } finally prior.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  // ---- Z-order layout ------------------------------------------------

  test("zOrder: interleave2 == the bit-level Morton reference, negatives included") {
    import graft.util.ZOrder
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(300)((rnd.nextInt(), rnd.nextInt()))
    def ref(a: Int, b: Int): Long = {
      var z = 0L; var i = 0
      while (i < 32) {
        z |= ((a.toLong >> i) & 1L) << (2 * i)
        z |= ((b.toLong >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val got = vals.toDF("a", "b")
      .select(ZOrder.interleave2($"a", $"b").as("z")).as[Long].collect().toSeq
    assert(got == vals.map { case (a, b) => ref(a, b) })
  }

  test("zOrder layout prunes on the non-sort dimension; one-column sort cannot") {
    import graft.util.ZOrder
    val n = 200000L
    val df = spark.range(n).select(col("id"),
      pmod(xxhash64(col("id"), lit(1)), lit(1024L)).as("a"),
      pmod(xxhash64(col("id"), lit(2)), lit(1024L)).as("b"),
      (col("id") % 97).as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_zord").toString
    ZOrder.writeZOrdered(df, "a", "b", s"$tmp/z", partitions = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(s"$tmp/lin")

    // rows MATERIALIZED from parquet (pre-filter), i.e. rows in files/
    // row groups that min/max stats could not skip
    val read = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          read.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    def measured(path: String): (Long, Long) = {
      // drain in-flight events from whatever ran before, then mark zero
      Thread.sleep(300); read.set(0)
      val res = spark.read.parquet(path).filter($"b" <= 63)
        .agg(sum("payload")).collect().head.getLong(0)
      // listener events post asynchronously — poll until stable
      var prev = -1L
      var stable = 0
      var spins = 0
      while (stable < 3 && spins < 50) {
        val cur = read.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        spins += 1; Thread.sleep(100)
      }
      (res, read.get())
    }
    try {
      val (zRes, zRead) = measured(s"$tmp/z")
      val (linRes, linRead) = measured(s"$tmp/lin")
      assert(zRes == linRes, "layout changed values")
      // linear layout is sorted on `a`: a predicate on `b` skips nothing
      assert(linRead >= n * 9 / 10, s"expected ~no pruning on linear, read $linRead")
      // z tiles carry tight min/max on BOTH dims: b <= 63 is 1/16 of the
      // space, only the bottom tile row survives (~1/4 of files + edges)
      assert(zRead <= linRead / 2,
        s"z-order read $zRead rows vs linear $linRead — expected < half")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("bucketed join+agg on the bucket key: zero exchanges end-to-end (q110 shape)") {
    val a = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "vb")
    val tmp = java.nio.file.Files.createTempDirectory("graft_bkt").toString
    ScaleJoins.writeBucketed(a, "bkt_agg_a", "k", 8, path = Some(s"$tmp/a"))
    ScaleJoins.writeBucketed(b, "bkt_agg_b", "k", 8, path = Some(s"$tmp/b"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // join on k AND aggregate by k: both reuse the storage partitioning
      val q = spark.table("bkt_agg_a").join(spark.table("bkt_agg_b"), "k")
        .groupBy("k").agg(count(lit(1)).as("n"), sum("va").as("s"))
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle in join+agg, got:\n$plan")
      assert(q.count() == 50)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_agg_a")
      spark.sql("DROP TABLE IF EXISTS bkt_agg_b")
    }
  }
}
