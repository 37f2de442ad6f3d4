package graft

import graft.prep.SequencePack
import graft.text.Keywords
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KeywordsAndPackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bm25Keywords: hand-computed scores, global df, deterministic ties") {
    // corpus: 3 docs; "rare" appears only in doc 0 and must outscore the
    // ubiquitous "the" there despite equal tf
    val docs = Seq(
      (0L, "the rare term the"),
      (1L, "the common words here"),
      (2L, "the common words again and again")
    ).toDF("doc_id", "text")
    val out = Keywords.bm25Keywords(docs, 2)
      .orderBy("doc_id", "rank").collect()

    // corpus stats: N=3, totTok=4+4+6=14
    val n = 3.0; val tot = 14.0
    def idf(df: Double) = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    def norm(tf: Double, dl: Double) =
      tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * n / tot))
    def score(tf: Double, df: Double, dl: Double) =
      BigDecimal(idf(df) * norm(tf, dl)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    val doc0 = out.filter(_.getLong(0) == 0L)
    assert(doc0.map(_.getString(1)).toSeq == Seq("rare", "term")) // "the" (df=3) loses
    assert(doc0.head.getDouble(4) == score(1, 1, 4))
    // doc 2: "again" tf=2 df=1 dominates; "and" (df=1) outranks the
    // df=2 terms on idf
    val doc2 = out.filter(_.getLong(0) == 2L)
    assert(doc2.map(_.getString(1)).toSeq == Seq("again", "and"))
    assert(doc2.head.getDouble(4) == score(2, 1, 6))
    // ties break on term ascending: doc 1 has four tf=1 terms; "common"
    // and "words" (df=2) tie below "here" (df=1)
    val doc1 = out.filter(_.getLong(0) == 1L).map(_.getString(1)).toSeq
    assert(doc1 == Seq("here", "common"))
  }

  test("sequencePack: offsets are the exact global prefix sum across group boundaries") {
    // groupWidth=2 forces multiple groups; blockSize=5 forces straddles
    val docs = Seq(
      (0L, "a b c"), (1L, "d e"), (2L, "f g h i"), (3L, ""), (4L, "j k")
    ).toDF("doc_id", "text")
    val out = SequencePack.pack(docs, 5, groupWidth = 2L)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "start_off", "block_id", "block_off", "spans_blocks")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))

    assert(out(0) == (0L, 3L, 0L, 0L, 0L, false))
    assert(out(1) == (1L, 2L, 3L, 0L, 3L, false)) // tokens 3..4 fit block 0
    assert(out(2) == (2L, 4L, 5L, 1L, 0L, false))
    assert(out(3) == (3L, 0L, 9L, 1L, 4L, false)) // empty doc: point-like
    assert(out(4) == (4L, 2L, 9L, 1L, 4L, true))  // tokens 9..10 straddle
  }

  test("bm25Keywords: empty corpus yields the schema with zero rows, no NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val out = Keywords.bm25Keywords(empty, 3)
    assert(out.columns.toSeq == Seq("doc_id", "term", "tf", "df", "score", "rank"))
    assert(out.count() == 0L)
  }

  test("profile: one-row stats with nulls, exact distincts, typed extrema") {
    val df = Seq(
      (Some(1L), Some("a"), Some(2.5)),
      (Some(1L), None, Some(-1.0)),
      (Some(3L), Some("b"), None)
    ).toDF("k", "s", "v")
    val r = graft.util.Profile.profile(df, Seq("k", "s", "v")).collect().head
    val m = r.schema.fieldNames.zipWithIndex.map { case (f, i) => f -> r.get(i) }.toMap
    assert(m("n_rows") == 3L)
    assert(m("k_nonnull") == 3L && m("k_distinct") == 2L && m("k_min") == 1L && m("k_max") == 3L)
    assert(m("s_nonnull") == 2L && m("s_distinct") == 2L && m("s_min") == "a" && m("s_max") == "b")
    assert(m("v_nonnull") == 2L && m("v_distinct") == 2L && m("v_min") == -1.0 && m("v_max") == 2.5)
  }

  test("containment: asymmetric n-gram leak detection with exact fractions") {
    val train = Seq(
      (0L, "alpha beta gamma delta"),       // shingles: abc, bcd
      (1L, "one two three four five")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "alpha beta gamma delta"),      // fully contained
      (11L, "alpha beta gamma zeta"),       // 1 of 2 shingles hit
      (12L, "totally novel text here"),     // zero hits
      (13L, "xy")                           // < k tokens: omitted
    ).toDF("doc_id", "text")
    val out = graft.text.Contamination.containment(train, eval, 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (10L, 2L, 2L, 1.0),
      (11L, 2L, 1L, 0.5),
      (12L, 2L, 0L, 0.0)))
  }

  test("sequencePack: two-level decomposition equals a single global cumsum") {
    val docs = (0L until 300L).map(i => (i, ("w " * (i % 7).toInt).trim)).toDF("doc_id", "text")
    val packed = SequencePack.pack(docs, 64, groupWidth = 16L)
      .select("doc_id", "start_off").as[(Long, Long)].collect().sortBy(_._1)
    var acc = 0L
    for ((id, off) <- packed) {
      assert(off == acc, s"doc $id")
      acc += (id % 7) // token count of doc id
    }
  }

  test("GraftExtensions: array_dot and hamming_dist reachable from pure SQL") {
    graft.functions.GraftExtensions.registerOn(spark)
    val r = spark.sql(
      """SELECT array_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d,
        |       hamming_dist('10110', '10011') AS h""".stripMargin).collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.getInt(1) == 2)
    // arity errors surface at analysis, not execution
    intercept[Exception](spark.sql("SELECT hamming_dist('a')").collect())
  }

  test("CharInterleave: codegen == eval == HOF formulation, UTF-8 safe") {
    graft.functions.GraftExtensions.registerOn(spark)
    // SQL path (codegen) vs the HOF formulation it replaces — non-empty
    // inputs only: on '' the HOF itself is wrong (sequence(1, 0) steps
    // DOWN to [1, 0], yielding '|'), which is why Bpe always filtered
    // empty words; CharInterleave returns '' as it should
    val rows = Seq("abc", "a", "héllo", "日本語x").toDF("s")
    val got = rows.select(
      graft.functions.CharInterleave(col("s"), lit("|")).as("fast"),
      array_join(transform(sequence(lit(1), length(col("s"))),
        i => col("s").substr(i, lit(1))), "|").as("hof"))
      .as[(String, String)].collect()
    got.foreach { case (fast, hof) => assert(fast == hof, s"'$fast' != '$hof'") }
    assert(got(0)._1 == "a|b|c" && got(1)._1 == "a")
    assert(got(2)._1 == "h|é|l|l|o" && got(3)._1 == "日|本|語|x")
    assert(Seq("").toDF("s")
      .select(graft.functions.CharInterleave(col("s"), lit("|")))
      .as[String].head() == "")
    // interpreted eval path agrees (filter forces a non-codegen context sometimes;
    // assert directly on the expression)
    val e = graft.functions.CharInterleave(
      org.apache.spark.sql.catalyst.expressions.Literal.create("héllo"),
      org.apache.spark.sql.catalyst.expressions.Literal.create("::"))
    assert(e.eval(null).toString == "h::é::l::l::o")
    // SQL registration
    val viaSql = spark.sql("SELECT char_interleave('abc', '-') AS v").collect().head.getString(0)
    assert(viaSql == "a-b-c")
    // malformed UTF-8 (first byte is a continuation byte, reachable via
    // binary->string cast, which Spark does not validate) must not
    // overrun the output buffer: 0x80 gets no leading separator, both
    // following ASCII bytes do
    val mal = spark.sql("SELECT char_interleave(cast(X'804142' AS STRING), '|') AS v")
      .collect().head.getString(0)
    assert(mal.getBytes("ISO-8859-1").count(_ == '|'.toByte) == 2, mal)
  }

  test("NfcNormalize: decomposed collapses to composed; ASCII fast path; SQL-reachable") {
    graft.functions.GraftExtensions.registerOn(spark)
    val decomposed = "e\u0301clat"   // e + COMBINING ACUTE
    val composed = "\u00e9clat"      // precomposed e-acute
    val got = Seq((decomposed, composed, "plain ascii")).toDF("d", "c", "a")
      .select(
        graft.functions.NfcNormalize(col("d")).as("nd"),
        graft.functions.NfcNormalize(col("c")).as("nc"),
        graft.functions.NfcNormalize(col("a")).as("na"),
        length(col("d")).as("ld"), length(graft.functions.NfcNormalize(col("d"))).as("lnd"))
      .as[(String, String, String, Int, Int)].head()
    assert(got._1 == composed && got._2 == composed && got._3 == "plain ascii")
    assert(got._4 == 6 && got._5 == 5) // one codepoint shorter after NFC
    val viaSql = spark.sql(s"SELECT nfc_normalize('$decomposed') AS v")
      .collect().head.getString(0)
    assert(viaSql == composed)
  }

  // ---- TokenBudget: the decomposed per-source budget prefix sum -------

  /** The naive single-window formulation the decomposition must equal. */
  private def naiveBudget(scored: org.apache.spark.sql.DataFrame, budget: Long) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source")
      .orderBy(col("quality").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.withColumn("cum_tokens", sum("n_tokens").over(w))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "source", "quality", "n_tokens", "cum_tokens")
  }

  test("tokenBudget: decomposed cumsum equals the naive window, boundary-exact") {
    import graft.prep.TokenBudget
    // one source (the worst case the decomposition exists for), a
    // quality MASS POINT at 0.9 spanning several doc groups, ties broken
    // by doc_id, a budget that lands mid-group, and a zero-token doc
    val rows = Seq(
      (0L, "s", 0.9, 5L), (1L, "s", 0.9, 5L), (2L, "s", 0.9, 5L),
      (3L, "s", 0.9, 5L), (4L, "s", 0.9, 0L), (5L, "s", 0.9, 5L),
      (6L, "s", 0.7, 3L), (7L, "s", 0.7, 3L),
      (8L, "s", 0.5, 100L), (9L, "s", 0.2, 1L),
      (10L, "t", 1.0, 7L), (11L, "t", 0.1, 50L))
    for (budget <- Seq(0L, 1L, 20L, 26L, 30L, 33L, 1000L)) {
      val scored = rows.toDF("doc_id", "source", "quality", "n_tokens")
      // docGroupWidth=2 forces dg boundaries inside the 0.9 mass point
      val got = TokenBudget.select(scored, budget, docGroupWidth = 2L)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      val want = naiveBudget(scored, budget)
        .orderBy("doc_id").collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      assert(got.toSeq == want.toSeq, s"budget=$budget")
    }
  }

  test("tokenBudget: no window sorts the corpus by source alone (scale guard)") {
    import graft.prep.TokenBudget
    import org.apache.spark.sql.execution.window.WindowExec
    val scored = (0L until 200L).map(i =>
      (i, "only_source", (i % 7) / 10.0, i % 13)).toDF("doc_id", "source", "quality", "n_tokens")
    val df = TokenBudget.select(scored, 100L, docGroupWidth = 16L)
    // sparkPlan, not executedPlan: AQE hides the tree until execution
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.references.map(_.name)).distinct
      if (keys == Seq("source")) {
        // the per-source window may only ever see the skinny
        // (source, quality) aggregate — never corpus rows
        assert(!w.child.output.map(_.name).contains("doc_id"),
          s"per-source window over corpus rows: ${w.child.output.map(_.name)}")
      }
      if (w.child.output.map(_.name).contains("doc_id")) {
        // any window touching corpus rows must carry the full
        // (source, quality, dg) decomposition key
        assert(keys.toSet == Set("source", "quality", "dg"),
          s"corpus-row window under-partitioned: $keys")
      }
    }
  }
}
