package graft

import graft.text.Bpe
import graft.util.{ScaleJoins, Upsert}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE tokenizer (q95/q96), LWW compaction (q97), bloom-pruned semi
  * join (q98). */
class BpeAndCompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Bpe.train: hand-worked merges on the classic low/lower corpus") {
    // word freqs: low x5, lower x2, newest x6, widest x3
    val docs = Seq((1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")))
      .toDF("doc_id", "text")
    // round 1: "es" and "st" both appear in newest+widest = 9; tie broken
    //   lexicographically -> (e,s)
    // round 2: (es,t) 9 beats everything else
    // round 3: pairs at 7: (l,o) 5+2 -> wait: lo in low(5)+lower(2)=7,
    //   ow in low+lower=7, (w,est) in newest? n-e-w-est: (w,est)=6 ...
    //   (l,o) vs (o,w) tie at 7 -> (l,o) lexicographically first
    // round 4: (lo,w) 7
    val merges = Bpe.train(docs, 4)
    assert(merges == Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")))
  }

  test("Bpe greedy merge scan: aaa + (a,a) -> [aa, a], non-overlapping left-to-right") {
    val docs = Seq((1L, "aaa aaaa")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq(("a", "a")))
    val row = enc.select("n_words", "n_tokens", "tokens").as[(Long, Long, String)].head()
    // aaa -> [aa, a]; aaaa -> [aa, aa]
    assert(row == ((2L, 4L, "aa a aa aa")))
  }

  test("Bpe chained merges: merged symbols participate in later merges") {
    val docs = Seq((1L, "mer mer her")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq(("e", "r"), ("m", "er")))
    val row = enc.select("n_tokens", "tokens").as[(Long, String)].head()
    // mer -> m|er -> mer (1 token); her -> h|er (2 tokens)
    assert(row == ((4L, "mer mer h er")))
  }

  test("Bpe merges match WHOLE tokens only — a symbol-suffix must not trigger a merge") {
    // after (e,r),(o,m): "tomer" = [t, om, er]. The (m, er) merge names
    // token "m", which is only a SUFFIX of "om" here — correct BPE
    // leaves [t, om, er]; an unanchored replace would weld "omer"
    val docs = Seq((1L, "tomer")).toDF("doc_id", "text")
    val enc = Bpe.encode(docs, Seq(("e", "r"), ("o", "m"), ("m", "er")))
    val row = enc.select("n_tokens", "tokens").as[(Long, String)].head()
    assert(row == ((3L, "t om er")))
    // and when the whole token IS "m", the merge fires
    val enc2 = Bpe.encode(Seq((1L, "tmer")).toDF("doc_id", "text"),
      Seq(("e", "r"), ("m", "er")))
    assert(enc2.select("tokens").as[String].head() == "t mer")
  }

  test("Bpe: reserved U+001F in input text is stripped, not corrupting") {
    // a corpus containing the separator used to corrupt the wrapped
    // tokenization and the separator-count token arithmetic silently
    // (identically in the SQL oracle, so only a unit test can pin it)
    val dirty = Seq((1L, "lo\u001fw \u001flow\u001f")).toDF("doc_id", "text")
    val clean = Seq((1L, "low low")).toDF("doc_id", "text")
    val merges = Seq(("l", "o"), ("lo", "w"))
    val got = Bpe.encode(dirty, merges)
      .select("n_words", "n_tokens", "tokens").as[(Long, Long, String)].head()
    val want = Bpe.encode(clean, merges)
      .select("n_words", "n_tokens", "tokens").as[(Long, Long, String)].head()
    assert(got == want)
    assert(got == ((2L, 2L, "low low")))
    // wordFreq sees the cleaned words too
    val wf = Bpe.wordFreq(dirty).as[(String, Long)].collect().toMap
    assert(wf == Map("low" -> 2L))
  }

  test("Bpe.encode with train's merges reproduces train's vocab tokenization") {
    val docs = Seq((1L, "low low lower newest newest widest")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, 3)
    val enc = Bpe.encode(docs, merges).select("n_tokens").as[Long].head()
    // independent recount: encode the same corpus word-by-word in Scala
    def applyMerges(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) { case (toks, (a, b)) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.toSeq
      }
    val expected = "low low lower newest newest widest".split(" ")
      .map(w => applyMerges(w).length.toLong).sum
    assert(enc == expected)
  }

  test("Upsert.compact: last version wins, untouched keys keep base, no phantom keys") {
    val base = Seq((1L, "a", 0), (2L, "b", 0), (3L, "c", 0)).toDF("k", "v", "version")
    val up1 = Seq((2L, "b1", 1)).toDF("k", "v", "version")
    val up2 = Seq((2L, "b2", 2), (3L, "c2", 2)).toDF("k", "v", "version")
    val got = Upsert.compact(Seq(base, up1, up2), "k", Seq("version"))
      .select("k", "v", "version").as[(Long, String, Int)].collect().toSet
    assert(got == Set((1L, "a", 0), (2L, "b2", 2), (3L, "c2", 2)))
  }

  test("Upsert.compact: tiebreak columns make equal versions deterministic") {
    val b1 = Seq((1L, "x", 1, 10L)).toDF("k", "v", "version", "seq")
    val b2 = Seq((1L, "y", 1, 20L)).toDF("k", "v", "version", "seq")
    val got = Upsert.compact(Seq(b1, b2), "k", Seq("version", "seq"))
      .select("v").as[String].head()
    assert(got == "y")
  }

  test("bloomSemiJoin == plain left_semi, including empty small side") {
    val big = (1L to 2000L).map(i => (i, i * 2)).toDF("key", "payload")
    val small = Seq(3L, 7L, 500L, 1999L, 4242L).toDF("key")
    val got = ScaleJoins.bloomSemiJoin(big, small, "key", 100L, 0.05)
      .select("key").as[Long].collect().sorted
    val want = big.join(small, Seq("key"), "left_semi")
      .select("key").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq && want.toSeq == Seq(3L, 7L, 500L, 1999L))
    val none = ScaleJoins.bloomSemiJoin(big, Seq.empty[Long].toDF("key"), "key", 10L, 0.05)
    assert(none.count() == 0)
  }

  test("bloomSemiJoin: null big-side keys are dropped, not crashed on") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("key")
    val small = Seq(1L).toDF("key")
    val got = ScaleJoins.bloomSemiJoin(big, small, "key", 10L, 0.05)
      .as[Long].collect().toSeq
    assert(got == Seq(1L))
  }

  test("plan pins: encode is shuffle-free; pairCounts is one exchange + top-k sort") {
    val docs = Seq((1L, "some words here")).toDF("doc_id", "text")
    val encPlan = Bpe.encode(docs, Seq(("e", "r")))
      .queryExecution.executedPlan.toString
    // pure per-row expression chain: no exchange anywhere
    assert(!encPlan.contains("Exchange"), s"encode must not shuffle:\n$encPlan")
    val pairPlan = Bpe.pairCounts(Bpe.initialVocab(docs))
      .orderBy(desc("cnt"), col("a"), col("b")).limit(20)
      .queryExecution.executedPlan.toString
    // two partial-aggregated exchanges (word-freq groupBy, pair groupBy);
    // the top-20 is TakeOrdered (per-partition heaps), never a global
    // sort exchange
    assert("Exchange hashpartitioning".r.findAllIn(pairPlan).size == 2, pairPlan)
    assert(pairPlan.contains("TakeOrderedAndProject") &&
      !pairPlan.contains("Exchange rangepartitioning"), pairPlan)
  }

  test("curationGate: each rule trips its own bit; a clean doc keeps") {
    import graft.text.TextOps
    // 26 distinct words (no repeated 3-grams), 2 en stopwords, mean word
    // length 105/26 ~ 4.0 chars: passes every rule
    val clean = "the alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda of mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val docs = Seq(
      (1L, "en", clean),                                    // keep
      (2L, "en", "short text here"),                        // bit 0: 3 words
      (3L, "fr", clean),                                    // bit 1: guesses en, declared fr
      (4L, "en", ("the of " * 20).trim),                    // repetition: dup 3-grams
      (5L, "en", ("the " + "abcdefghijklmnopqrst " * 25).trim)) // long words -> bit 4
      .toDF("doc_id", "lang", "text")
    val got = TextOps.curationGate(docs)
      .select("doc_id", "reasons", "keep").as[(Long, Int, Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((0, true)))
    assert((got(2L)._1 & 1) == 1 && !got(2L)._2)   // too short
    assert((got(3L)._1 & 2) == 2 && !got(3L)._2)   // lang disagrees
    assert((got(4L)._1 & 8) == 8 && !got(4L)._2)   // repetitive
    assert((got(5L)._1 & 16) == 16 && !got(5L)._2) // word length out of band
  }

  test("curationGate: stopword-poor doc trips bit 2 only when long enough") {
    import graft.text.TextOps
    val noStops = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct words, 0 stopwords
    val got = TextOps.curationGate(Seq((1L, "en", noStops)).toDF("doc_id", "lang", "text"))
      .select("reasons").as[Int].head()
    assert((got & 4) == 4 && (got & 1) == 0)
  }

  test("Upsert.diff: added/removed/changed/unchanged classification") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "fp")
    val next = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("k", "fp")
    val got = Upsert.diff(base, next, "k", "fp")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("q101 sorted layout: key-range predicate reaches the parquet scan (PushedFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sorted_spec").toString
    (1L to 500L).map(i => (i, s"t$i")).toDF("doc_id", "text")
      .repartitionByRange(4, col("doc_id")).sortWithinPartitions("doc_id")
      .write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("doc_id").between(100, 200))
    val plan = back.queryExecution.executedPlan.toString
    val pushed = plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("GreaterThanOrEqual(doc_id,100)") &&
      pushed.contains("LessThanOrEqual(doc_id,200)"), plan)
    assert(back.count() == 101)
  }

  test("StreamingUpsert batch mode == Upsert.compact winners") {
    import graft.stream.StreamingUpsert
    import graft.stream.StreamingUpsert.Versioned
    val rows = Seq(
      Versioned(1L, 0, "a"), Versioned(2L, 0, "b"), Versioned(3L, 0, "c"),
      Versioned(2L, 1, "b1"), Versioned(3L, 2, "c2"), Versioned(3L, 1, "c1"))
    val ds = spark.createDataset(rows)
    val got = StreamingUpsert.compactStream(ds)
      .collect().map(v => (v.key, v.version, v.fp)).toSet
    val want = Upsert.compact(
      Seq(ds.toDF()), "key", Seq("version", "fp"))
      .as[Versioned].collect().map(v => (v.key, v.version, v.fp)).toSet
    assert(got == want &&
      got == Set((1L, 0, "a"), (2L, 1, "b1"), (3L, 2, "c2")))
  }

  test("StreamingUpsert tiebreak: UTF-8 byte order, matching Upsert.compact on non-ASCII fps") {
    import graft.stream.StreamingUpsert
    import graft.stream.StreamingUpsert.Versioned
    // U+10000 (UTF-8 F0 90 80 80) vs U+EE00 (UTF-8 EE B8 80): Java's
    // UTF-16 compareTo says supplementary < EE00, UTF-8 bytes say the
    // opposite — the kernel must agree with Spark's window orderBy
    val rows = Seq(Versioned(1L, 1, "\uD800\uDC00"), Versioned(1L, 1, "\uEE00"))
    val ds = spark.createDataset(rows)
    val stream = StreamingUpsert.compactStream(ds).collect()
    val batch = Upsert.compact(Seq(ds.toDF()), "key", Seq("version", "fp"))
      .as[Versioned].collect()
    assert(stream.length == 1 && batch.length == 1)
    assert(stream.head.fp == batch.head.fp && stream.head.fp == "\uD800\uDC00")
  }

  test("StreamingUpsert stream: change-log emits only ADVANCES; replay last-per-key == compact") {
    import graft.stream.StreamingUpsert
    import graft.stream.StreamingUpsert.Versioned
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Versioned]
    val q = StreamingUpsert.compactStream(input.toDS())
      .writeStream.outputMode("append").format("memory")
      .queryName("upsert_stream").start()
    try {
      input.addData(Versioned(1L, 0, "a"), Versioned(2L, 0, "b"))
      q.processAllAvailable()
      // stale version for key 1 (swallowed), advance for key 2, new key 3
      input.addData(Versioned(1L, 0, "a"), Versioned(2L, 2, "b2"), Versioned(3L, 0, "c"))
      q.processAllAvailable()
      // out-of-order late lower version for key 2: swallowed
      input.addData(Versioned(2L, 1, "b1"))
      q.processAllAvailable()
      val log = spark.table("upsert_stream").as[Versioned].collect()
      assert(log.length == 4) // a, b, b2, c — the b1 and duplicate-a rows never emit
      val lastPerKey = log.groupBy(_.key).map { case (k, vs) =>
        val w = vs.maxBy(v => (v.version, v.fp)); (k, w.version, w.fp)
      }.toSet
      assert(lastPerKey == Set((1L, 0, "a"), (2L, 2, "b2"), (3L, 0, "c")))
    } finally q.stop()
  }

  test("hardNegatives: near-dups above the ceiling are excluded, hardest survivor ranks first") {
    import graft.knn.CosineKnn
    val vecs = Seq(
      (1L, Array(1.0, 0.0)),            // query
      (2L, Array(1.0, 0.0)),            // exact dup (cos 1.0) -> excluded
      (3L, Array(0.999, 0.0447)),       // cos ~0.999 -> excluded at 0.95
      (4L, Array(0.9, 0.4359)),         // cos 0.9 -> the hard negative
      (5L, Array(0.0, 1.0)))            // cos 0 -> easy negative
      .toDF("id", "vec")
    val got = CosineKnn.hardNegatives(vecs.filter(col("id") === 1L), vecs, 2, 0.95)
      .orderBy("rank").select("item_id", "rank")
      .as[(Long, Int)].collect().toSeq
    assert(got == Seq((4L, 1), (5L, 2)))
  }

  test("plan pins: compact is one key-windowed exchange, no join") {
    val base = Seq((1L, "a", 0)).toDF("k", "v", "version")
    val up = Seq((1L, "b", 1)).toDF("k", "v", "version")
    val plan = Upsert.compact(Seq(base, up), "k", Seq("version"))
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan)
    assert(!plan.toLowerCase.contains("join"), plan)
  }
}
