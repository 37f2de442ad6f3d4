package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan guards for the round-10 analytics wave — the scale
  * claims each operator's scaladoc makes, pinned so a refactor that
  * silently reintroduces a shuffle/join/window shows up as a red
  * test, not a 100 TB incident. */
class WavePlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String = {
    val df = SparkEntry.queries(q)(spark, dir)
    df.queryExecution.explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  // formatted mode prints each operator in the tree AND once as a
  // numbered details header "(N) Op" — count the headers
  private def nOps(p: String, op: String): Int =
    s"""\\(\\d+\\) $op""".r.findAllIn(p).length

  /** A plain Window operator is "guarded" when its immediate child in
    * the plan tree is a WindowGroupLimit (the rank-cut shape: at most k
    * rows per group reach the window's sort). An unguarded window sorts
    * its whole group — fine over a bounded rollup, a straggler trap
    * over a raw corpus. */
  private def unguardedWindows(p: String): Int = {
    val lines = p.linesIterator.toArray
    lines.indices.count { i =>
      lines(i).matches(""".*[+:]- Window \(\d+\).*""") &&
        (i + 1 >= lines.length || !lines(i + 1).contains("WindowGroupLimit"))
    }
  }

  test("q127 collocations: the corpus never shuffles into a join (broadcast-only joins)") {
    val p = plan("q127_collocations")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
    assert(nOps(p, "Generate") >= 1) // the narrow within-row bigram build
  }

  test("q134 co-occurrence: zero join nodes, one aggregate exchange over generated pairs") {
    val p = plan("q134_cooccurrence")
    assert(nOps(p, "\\w*Join") == 0)
    assert(nOps(p, "Exchange") == 1)
  }

  test("q129 funnel: one exchange, no window operator") {
    val p = plan("q129_funnel")
    assert(nOps(p, "Exchange") == 1)
    assert(nOps(p, "Window") == 0)
  }

  test("q131 cohort retention: one corpus exchange plus the skinny rollup, no join") {
    val p = plan("q131_cohort_retention")
    assert(nOps(p, "Exchange") == 2)
    assert(nOps(p, "\\w*Join") == 0)
  }

  test("q132 session transitions: both windows share one exchange") {
    val p = plan("q132_session_transitions")
    // per-user window exchange + final (from, to) count exchange —
    // a per-session re-window would add a third
    assert(nOps(p, "Exchange") == 2)
  }

  test("q133 RRF: every ranking window is group-limited (WindowGroupLimit fired)") {
    val p = plan("q133_rrf_fusion")
    assert(nOps(p, "WindowGroupLimit") >= 1, p)
    assert(unguardedWindows(p) == 0, s"unguarded window in the plan:\n$p")
    assert(!p.contains("ExistingRDD"), p)
  }

  test("q130 inverted index: two exchanges, no join") {
    val p = plan("q130_inverted_index")
    assert(nOps(p, "Exchange") == 2)
    assert(nOps(p, "\\w*Join") == 0)
  }

  // ---- continuation wave (q137+) --------------------------------------

  test("q137 coverage/Gini: every window input is a rollup, never the raw rec table") {
    val p = plan("q137_rec_coverage")
    // exactly ONE unguarded window (the Gini cumulative over distinct
    // count VALUES — a rollup, bounded input); every other window is a
    // knn-chain rank cut riding WindowGroupLimit
    assert(unguardedWindows(p) == 1,
      s"expected exactly 1 unguarded window:\n$p")
    assert(!p.contains("ExistingRDD"), p)
  }

  test("q140 funnel horizon keeps the q129 shape: one exchange, no window") {
    val p = plan("q140_funnel_horizon")
    assert(nOps(p, "Exchange") == 1)
    assert(nOps(p, "Window") == 0)
  }

  test("q141 attribution: zero join nodes (the as-of merge-sort shape)") {
    val p = plan("q141_attribution")
    assert(nOps(p, "\\w*Join") == 0)
  }

  test("q144 bigram LM: bigram pairing is narrow (no window, no per-doc sort before the zip)") {
    val p = plan("q144_bigram_logprob")
    assert(nOps(p, "Window") == 0)
    assert(nOps(p, "Generate") >= 1)
  }

  test("q148 negative sampling: DenseIndex plan is range-partitioned ranks, no cartesian") {
    // the query's own final plan starts at TopK's RDD materialization,
    // so pin the DenseIndex subplan directly: a range exchange feeding
    // the per-partition local rank, the #partitions-row offset cumsum,
    // and the broadcast offset join — and never a global single-
    // partition sort of the key table
    val items = Tables.ratings(spark, dir).select("item_id").distinct()
    // the layout phase (range exchange + per-partition local rank) now
    // sits BEHIND the eager checkpoint that pins one boundary sample
    // (DenseIndex.scala) — assert its shape on the same pipeline byKey
    // builds, pre-checkpoint
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{col, row_number, spark_partition_id}
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val localShape = items.repartitionByRange(parts, col("item_id"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy("__pid").orderBy(col("item_id"))))
      .queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(nOps(localShape, "Window") == 1)
    assert(localShape.contains("rangepartitioning"))
    // the post-checkpoint plan: only the skinny #partitions-row offset
    // cumsum window survives, and the offset attach is the explicit
    // broadcast() — never a shuffle join
    val p = graft.util.DenseIndex.byKey(items, "item_id").queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(nOps(p, "Window") == 1)
    assert(nOps(p, "SortMergeJoin") == 0 && nOps(p, "ShuffledHashJoin") == 0)
    val q = plan("q148_negative_sampling")
    assert(!q.contains("CartesianProduct") && !q.contains("BroadcastNestedLoop"))
  }
}
