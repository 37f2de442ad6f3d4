package graft

import graft.text.TextOps
import org.scalatest.funsuite.AnyFunSuite

/** perplexityBuckets (CCNet terciles): rank split semantics, fluency
  * ordering, short-doc exclusion, partition invariance. */
class PerplexityBucketsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // fluent docs repeat corpus-common bigrams; noisy docs are unique
  private val docs = (
    (1 to 6).map(i => (i.toLong, "the cat sat on the mat " * 3, "en")) ++
    Seq((7L, "zeta quux blorp flarn greeble womp", "en"),
        (8L, "mumble frotz xyzzy plugh glorp snarf", "en"),
        (9L, "the cat sat on zeta quux mumble", "en"),
        (10L, "le chat le chat le chat", "fr"),
        (11L, "ancien tresor cache jardin", "fr"),
        (12L, "le chat ancien tresor", "fr"),
        (13L, "single", "en")) // 1 token: no bigrams, absent
  ).map { case (id, t, l) => (id, t.trim, l) }.toDF("doc_id", "text", "lang")

  test("tercile sizes, fluency ordering, and short-doc exclusion") {
    val got = TextOps.perplexityBuckets(docs).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2), r.getString(3))))
      .toMap
    assert(!got.contains(13L), "a 1-token doc has no bigrams")
    // en: 9 scored docs -> terciles of 3/3/3; fr: 3 docs -> 1/1/1
    val en = got.filter(_._2._1 == "en").values
    assert(en.count(_._3 == "head") == 3 && en.count(_._3 == "middle") == 3
      && en.count(_._3 == "tail") == 3)
    val fr = got.filter(_._2._1 == "fr").values
    assert(fr.count(_._3 == "head") == 1 && fr.count(_._3 == "middle") == 1
      && fr.count(_._3 == "tail") == 1)
    // every head doc outscores (or ties at round-6) every tail doc per lang
    for (lang <- Seq("en", "fr")) {
      val byB = got.values.filter(_._1 == lang).groupBy(_._3)
      assert(byB("head").map(_._2).min >= byB("tail").map(_._2).max)
    }
    // the unique-bigram docs land in the en tail
    assert(got(7L)._3 == "tail" && got(8L)._3 == "tail")
  }

  test("ntile front-loads the remainder (n = 4 -> 2/1/1) and ties break on doc_id") {
    val four = Seq(
      (1L, "a b a b", "xx"), (2L, "a b a b", "xx"),
      (3L, "a b a b", "xx"), (4L, "c d e f", "xx"))
      .toDF("doc_id", "text", "lang")
    val got = TextOps.perplexityBuckets(four).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    // docs 1-3 tie on avg_logp; doc_id order puts 1,2 -> head(2), 3 -> middle
    assert(got == Map(1L -> "head", 2L -> "head", 3L -> "middle", 4L -> "tail"))
  }

  test("partition invariance") {
    val a = TextOps.perplexityBuckets(docs).collect().map(_.toString).sorted.toSeq
    val b = TextOps.perplexityBuckets(docs.repartition(7)).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
