package graft

import graft.stream.StreamingDedup
import graft.text.{Dedup, LineDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Line-level corpus dedup (q89), span-level dup stats (q90), and the
  * streaming LSH bucket-anchor kernel (q94). */
class LineAndStreamDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("linesByWords: integer boundaries, short tail line") {
    val d = docs((1L, "a b c d e f g"))
    val got = LineDedup.linesByWords(d, 3).orderBy("line_idx")
      .as[(Long, Int, String)].collect()
    assert(got.toSeq == Seq((1L, 0, "a b c"), (1L, 1, "d e f"), (1L, 2, "g")))
  }

  test("dedupLines: first occurrence by (doc_id, line_idx) wins, corpus-wide") {
    val d = docs(
      (1L, "x y z a b c"),   // lines: "x y z", "a b c"
      (2L, "a b c x y z"),   // both lines already seen in doc 1
      (3L, "q r s a b c"))   // "q r s" fresh, "a b c" dup
    val kept = LineDedup.dedupLines(LineDedup.linesByWords(d, 3))
      .filter(col("kept")).select("doc_id", "line_idx", "line")
      .as[(Long, Int, String)].collect().toSet
    assert(kept == Set((1L, 0, "x y z"), (1L, 1, "a b c"), (3L, 0, "q r s")))
  }

  test("dedupCorpus: counts + reassembly in original order; fully-dup doc -> empty text") {
    val d = docs(
      (1L, "x y z a b c"),
      (2L, "a b c x y z"), // nothing survives
      (3L, "q r s a b c"))
    val got = LineDedup.dedupCorpus(d, 3)
      .select("doc_id", "n_lines", "n_kept", "text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, "x y z\na b c")))
    assert(got(2L) == ((2L, 2L, 0L, "")))
    assert(got(3L) == ((3L, 2L, 1L, "q r s")))
  }

  test("firstOccurrences == dedupLines kept set; dedupCorpus carries no window sort") {
    val d = docs(
      (1L, "x y z a b c"), (2L, "a b c x y z"), (3L, "q r s a b c"),
      (4L, "a b c a b c")) // within-doc repeat of an already-seen line
    val lines = LineDedup.linesByWords(d, 3)
    val viaWindow = LineDedup.dedupLines(lines)
      .filter(col("kept")).select("doc_id", "line_idx", "line")
      .as[(Long, Int, String)].collect().toSet
    val viaAgg = LineDedup.firstOccurrences(lines)
      .as[(Long, Int, String)].collect().toSet
    assert(viaAgg == viaWindow)
    // the hot-line escape hatch: the end-to-end plan must contain no
    // window (= no per-line occurrence sort), only aggregates
    import org.apache.spark.sql.execution.window.WindowExec
    val plan = LineDedup.dedupCorpus(d, 3).queryExecution.sparkPlan
    assert(plan.collect { case w: WindowExec => w }.isEmpty)
  }

  test("dupSpanStats: positional spans, distinct-doc threshold, floor permille") {
    // doc 1: 6 words -> 2 positional 5-grams; doc 2 shares exactly the
    // first one; doc 3 shares nothing
    val d = docs(
      (1L, "a b c d e f"),      // spans: "a b c d e", "b c d e f"
      (2L, "a b c d e z z z"),  // spans: "a b c d e", "b c d e z", ... (4 spans)
      (3L, "p q r s t u"))      // 2 spans, none shared
    val got = Dedup.dupSpanStats(d, 5)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_permille")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 1L, 500L)))
    assert(got(2L) == ((2L, 4L, 1L, 250L)))
    assert(got(3L) == ((3L, 2L, 0L, 0L)))
  }

  test("dupSpanStats: within-doc repetition alone is NOT cross-doc duplication") {
    val d = docs((1L, "a b c d e a b c d e a b c d e"), (2L, "p q r s t u"))
    val got = Dedup.dupSpanStats(d, 5)
      .filter(col("doc_id") === 1L)
      .select("n_dup_spans").as[Long].head()
    assert(got == 0L)
  }

  test("streaming bucketed == relational bandBuckets keys") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words in this one here now"))
      .toDF("doc_id", "text")
    val narrow = StreamingDedup.bucketed(d, 4, 3, 2)
      .select("doc_id", "bucket").as[(Long, String)].collect().toSet
    val relational = Dedup.bandBuckets(d, 4, 3, 2)
      .select(col("doc_id"),
        concat_ws(":", col("b"), col("h1"), col("h2")).as("bucket"))
      .as[(Long, String)].collect().toSet
    assert(narrow == relational && narrow.size == 12)
  }

  test("batch candidatePairs == relational lshAnchorPairs") {
    val d = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "the quick brown fox jumps over the lazy dog again"),
      (13L, "completely different words in this document right here now"))
      .toDF("doc_id", "text")
    val stateful = StreamingDedup.candidates(d, 4, 3, 2)
      .collect().map(p => (p.doc_a, p.doc_b, p.b)).toSet
    val relational = Dedup.lshAnchorPairs(d, 4, 3, 2)
      .as[(Long, Long, Int)].collect().toSet
    assert(stateful == relational && stateful.nonEmpty)
    // identical docs collide in every band with the anchor 10
    assert(stateful.count(p => p._1 == 10L && p._2 == 11L) == 4)
  }

  test("streaming candidatePairs (doc_id-ordered feed) == batch == relational") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"),
      (11L, "the quick brown fox jumps over the lazy dog today"),
      (12L, "the quick brown fox jumps over the lazy dog again"),
      (13L, "completely different words in this document right here now"))
    val batch = StreamingDedup.candidates(rows.toDF("doc_id", "text"), 4, 3, 2)
      .collect().map(p => (p.doc_a, p.doc_b, p.b)).toSet

    val input = MemoryStream[(Long, String)]
    val bucketed = StreamingDedup.bucketed(
      input.toDS().toDF("doc_id", "text"), 4, 3, 2)
      .as[StreamingDedup.BucketedDoc]
    val q = StreamingDedup.candidatePairs(bucketed)
      .writeStream.outputMode("append").format("memory")
      .queryName("lsh_dedup_stream").start()
    try {
      // one doc per trigger, in doc_id order: anchors must match batch
      rows.foreach { r => input.addData(r); q.processAllAvailable() }
      val streamed = spark.table("lsh_dedup_stream")
        .as[StreamingDedup.CandPair]
        .collect().map(p => (p.doc_a, p.doc_b, p.b)).toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming candidatePairs: out-of-order arrival anchors by FIRST ARRIVAL, not min id") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val text = "the quick brown fox jumps over the lazy dog today"
    val input = MemoryStream[(Long, String)]
    val bucketed = StreamingDedup.bucketed(
      input.toDS().toDF("doc_id", "text"), 4, 3, 2)
      .as[StreamingDedup.BucketedDoc]
    val q = StreamingDedup.candidatePairs(bucketed)
      .writeStream.outputMode("append").format("memory")
      .queryName("lsh_ooo_stream").start()
    try {
      // doc 30 arrives BEFORE doc 20: the ingest-time contract keeps the
      // earliest ARRIVAL as anchor — this is the semantic difference from
      // batch (min doc_id), intentional: a stream dedups new arrivals
      // against what is already ingested
      input.addData((30L, text)); q.processAllAvailable()
      input.addData((20L, text)); q.processAllAvailable()
      val pairs = spark.table("lsh_ooo_stream").as[StreamingDedup.CandPair]
        .collect().map(p => (p.doc_a, p.doc_b)).distinct
      assert(pairs.toSeq == Seq((30L, 20L)))
    } finally q.stop()
  }

  test("plan pins: line dedup exchanges are partial-aggregated; the only join is doc-keyed") {
    val d = docs((1L, "a b c d e f"))
    val qe = LineDedup.dedupCorpus(d, 3).queryExecution
    val plan = qe.executedPlan.toString
    // line-keyed min-agg, doc-keyed totals, doc-keyed reassembly — all
    // partial-aggregated (hot lines collapse map-side before the wire);
    // the totals⋈kept join is on doc_id only and never moves line rows
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 3, plan)
    assert(plan.contains("partial_min") || plan.contains("partial min")
      || plan.linesIterator.exists(l => l.contains("HashAggregate") && l.contains("min")), plan)
    import org.apache.spark.sql.execution.window.WindowExec
    assert(qe.sparkPlan.collect { case w: WindowExec => w }.isEmpty,
      "dedupCorpus must not sort line-occurrence lists")
  }

  test("plan pins: streaming bucket keys are computed without any exchange") {
    val d = docs((1L, "a b c d e f"))
    val plan = StreamingDedup.bucketed(d, 4, 3, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"narrow bucket keys must not shuffle:\n$plan")
  }

  test("q91 partitioned sink: read-back scan is partition-pruned, not row-filtered") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_spec").toString
    Seq((1L, "en", "a"), (2L, "fr", "b"), (3L, "de", "c"), (4L, "en", "d"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("lang").isin("en", "fr"))
    val plan = back.queryExecution.executedPlan.toString
    // the lang predicate must land in PartitionFilters (pruned before any
    // row is read), not in the data-filter/PushedFilters section
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"))
    assert(!plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1").contains("lang"))
    assert(back.count() == 3)
  }
}
