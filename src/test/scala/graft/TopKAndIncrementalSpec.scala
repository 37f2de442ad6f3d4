package graft

import graft.util.{IncrementalAgg, TopK}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKAndIncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---- TopK.perGroup --------------------------------------------------

  private def rndRows(seed: Int, n: Int, groups: Int, withNulls: Boolean) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val score: java.lang.Double =
        if (withNulls && rnd.nextInt(20) == 0) null
        else java.lang.Double.valueOf(rnd.nextInt(1000) / 10.0) // duplicate scores on purpose
      (rnd.nextInt(groups).toLong, i.toLong, score, s"p$i")
    }.toDF("g", "id", "score", "payload")
  }

  test("perGroup == window rank, both directions, ties and nulls included") {
    val df = rndRows(1, 5000, 37, withNulls = true)
    for (desc <- Seq(true, false); k <- Seq(1, 3, 10)) {
      val ord = if (desc) col("score").desc else col("score").asc
      // Spark window defaults: desc = NULLS LAST, asc = NULLS FIRST —
      // the heap's null-is-smallest comparator must agree
      val want = df.withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(ord, col("id"))))
        .filter(col("rank") <= k)
        .select("g", "id", "rank").as[(Long, Long, Int)].collect().toSet
      val got = TopK.perGroup(df, Seq("g"), "score", Seq("id"), k, descending = desc)
        .select("g", "id", "rank").as[(Long, Long, Int)].collect().toSet
      assert(got == want, s"desc=$desc k=$k")
    }
  }

  test("perGroup shuffles bounded heaps, not the corpus (recordsWritten A/B)") {
    val n = 200000L
    // 40 groups × ~5k rows — the hot-group shape where the window's
    // full per-group sort is the scale problem
    val df = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1)), lit(40L)).as("g"),
      col("id"),
      (pmod(xxhash64(col("id"), lit(2)), lit(100000L)) / 10.0).as("score"),
      concat(lit("p"), col("id")).as("payload"))
      .persist()
    df.count()
    val written = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          written.addAndGet(te.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    def measure(body: => Unit): Long = {
      Thread.sleep(300); written.set(0)
      body
      var prev = -1L; var stable = 0; var spins = 0
      while (stable < 3 && spins < 50) {
        val cur = written.get()
        if (cur == prev) stable += 1 else { stable = 0; prev = cur }
        spins += 1; Thread.sleep(100)
      }
      written.get()
    }
    def windowTopK() =
      df.withColumn("rank", row_number().over(
          Window.partitionBy("g").orderBy(col("score").desc, col("id"))))
        .filter(col("rank") <= 5).count()
    spark.sparkContext.addSparkListener(listener)
    try {
      // Spark's own WindowGroupLimit (3.5+) also bounds the shuffle for
      // the rank-filter-adjacent shape — measure it honestly ...
      val windowPushed = measure(windowTopK())
      // ... but it only fires when the rule matches; disabled, the
      // window ships the whole corpus
      spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "-1")
      val windowRaw =
        try measure(windowTopK())
        finally spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold", "1000")
      val heapWritten = measure {
        TopK.perGroup(df, Seq("g"), "score", Seq("id"), 5).count()
      }
      assert(windowRaw >= n, s"unpushed window should shuffle every row, wrote $windowRaw")
      // heap exchange carries at most groups × map-partitions × k rows,
      // same bound WindowGroupLimit achieves on plans it matches (the
      // heap additionally skips the rule's full map-side partition sort
      // and works under any consumer shape)
      assert(heapWritten <= n / 10,
        s"bounded-heap combine wrote $heapWritten shuffle rows (raw window: $windowRaw)")
      assert(windowPushed <= n / 10,
        s"WindowGroupLimit did not bound the pushed window: $windowPushed")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      df.unpersist()
    }
  }

  test("perGroup: multi-column groups and string order columns") {
    val df = Seq(
      ("a", 1L, "x", 10L), ("a", 1L, "y", 11L), ("a", 2L, "z", 12L),
      ("b", 1L, "w", 13L), ("b", 1L, "v", 14L))
      .toDF("g1", "g2", "s", "id")
    val got = TopK.perGroup(df, Seq("g1", "g2"), "s", Seq("id"), 1)
      .select("g1", "g2", "s").collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // string desc: lexicographically greatest per (g1, g2)
    assert(got == Set(("a", 1L, "y"), ("a", 2L, "z"), ("b", 1L, "w")))
  }

  // ---- IncrementalAgg -------------------------------------------------

  test("refresh chain == from-scratch recompute; merge is batching-invariant") {
    val rnd = new scala.util.Random(9)
    def batch(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      // group space shifts per batch: some groups exist only in some deltas
      (1 to n).map(_ => (r.nextInt(30).toLong + seed * 7L, r.nextInt(1000).toLong))
        .toDF("g", "v")
    }
    val batches = Seq(batch(1, 4000), batch(2, 3000), batch(3, 2000), batch(4, 10))
    val grp = Seq("g")
    // sequential refreshes
    val viaRefresh = batches.tail.foldLeft(IncrementalAgg.state(batches.head, grp, "v")) {
      (st, d) => IncrementalAgg.refresh(st, d, grp, "v")
    }
    // one-shot merge of per-batch states
    val viaMerge = IncrementalAgg.merge(batches.map(IncrementalAgg.state(_, grp, "v")), grp)
    // ground truth
    val full = IncrementalAgg.state(batches.reduce(_ unionByName _), grp, "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "n", "sum", "min", "max")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
    val truth = snap(full)
    assert(snap(viaRefresh) == truth)
    assert(snap(viaMerge) == truth)
    assert(truth.nonEmpty && rnd.nextInt() != 0)
  }

  test("refresh never rescans the base: only delta and state reach the plan") {
    val base = (1 to 1000).map(i => (i.toLong % 20, i.toLong)).toDF("g", "v")
    val st = IncrementalAgg.state(base, Seq("g"), "v")
      .persist()
    st.count()
    val delta = (1 to 50).map(i => (i.toLong % 25, i.toLong * 2)).toDF("g", "v")
    val refreshed = IncrementalAgg.refresh(st, delta, Seq("g"), "v")
    // the refresh plan reads the MATERIALIZED state (InMemoryTableScan),
    // not base's LocalTableScan lineage
    val plan = refreshed.queryExecution.executedPlan.toString
    assert(plan.contains("InMemoryTableScan"), s"state not read from cache:\n$plan")
    // value check: group 20-24 exist only in the delta
    val row = refreshed.filter(col("g") === 21L).select("n", "sum")
      .as[(Long, Long)].collect().toSeq
    assert(row == Seq((2L, (21L + 46L) * 2)), s"delta-only group wrong: $row")
    st.unpersist()
  }

  // ---- IncrementalAgg: mergeable distinct (HLL sketch state) ---------

  test("sketch refresh == from-scratch sketch: estimates identical under any batching") {
    val rows = (1 to 30000).map(i => (i.toLong % 4, i.toLong, s"u${i % 2500}"))
    val all = rows.toDF("g", "v", "u")
    def est(df: org.apache.spark.sql.DataFrame) =
      IncrementalAgg.estimateDistinct(df)
        .select("g", "approx_distinct").as[(Long, Long)].collect().toMap
    val scratch = est(IncrementalAgg.stateWithDistinct(all, Seq("g"), "v", "u"))
    for (nb <- Seq(2, 5)) {
      val batches = rows.grouped(rows.size / nb + 1).map(_.toDF("g", "v", "u")).toSeq
      val viaRefresh = batches.tail.foldLeft(
        IncrementalAgg.stateWithDistinct(batches.head, Seq("g"), "v", "u")) {
        (st, d) => IncrementalAgg.refreshWithDistinct(st, d, Seq("g"), "v", "u")
      }
      // register union is max-per-register: merged sketches estimate
      // EXACTLY what the single-pass sketch estimates
      assert(est(viaRefresh) == scratch, s"batching nb=$nb changed the estimate")
    }
  }

  test("sketch estimate tracks exact distinct within 5%") {
    val rows = (1 to 50000).map(i => (i.toLong % 3, i.toLong, s"k${(i * 7) % 9000}"))
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._3).distinct.size.toLong).toMap
    val approx = IncrementalAgg.estimateDistinct(
      IncrementalAgg.stateWithDistinct(rows.toDF("g", "v", "u"), Seq("g"), "v", "u"))
      .select("g", "approx_distinct").as[(Long, Long)].collect().toMap
    exact.foreach { case (g, ex) =>
      val ap = approx(g)
      assert(math.abs(ap - ex).toDouble / ex < 0.05, s"g=$g exact=$ex approx=$ap")
    }
  }
}
