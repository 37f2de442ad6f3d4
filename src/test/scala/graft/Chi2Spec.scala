package graft

import graft.text.Chi2
import org.scalatest.funsuite.AnyFunSuite

/** Chi2.topTermsByClass: hand contingency check, df floor, the
  * every-doc-term exclusion, per-class top-k rank order, and a driver
  * brute-force agreement on a seeded corpus. */
class Chi2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[(Long, String, String)], k: Int, minDf: Long)
      : Seq[(String, String, Long)] = {
    val toks = docs.map { case (id, cls, text) =>
      (id, cls, text.toLowerCase.split(" ").filter(_.nonEmpty).distinct.toSet)
    }
    val n = toks.size.toLong
    val classes = toks.map(_._2).distinct
    val vocab = toks.flatMap(_._3).distinct
      .filter(t => toks.count(_._3.contains(t)) >= minDf)
    (for {
      cls <- classes
      term <- vocab
      tDf = toks.count(_._3.contains(term)).toLong
      cN = toks.count(_._2 == cls).toLong
      if tDf < n && cN < n
      a = toks.count(x => x._2 == cls && x._3.contains(term)).toLong
      if a > 0 // aCnt only has observed (term, cls) rows
    } yield {
      val adbc = (BigInt(a) * BigInt(n - tDf - cN + a) -
        BigInt(tDf - a) * BigInt(cN - a)).toDouble
      val den = tDf.toDouble * (n - tDf) * cN * (n - cN)
      val chi2 = n.toDouble * (adbc * adbc) / den
      (cls, term, BigDecimal(chi2 * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }).groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(k)
    }
  }

  private val corpus = Seq(
    (1L, "en", "the cat sat on the mat"),
    (2L, "en", "the dog sat on the log"),
    (3L, "en", "cat and dog and mat"),
    (4L, "fr", "le chat et le chien"),
    (5L, "fr", "le chien dort the"),
    (6L, "fr", "chat noir et chien"))

  test("hand contingency: 'le' is the top French term, 'the' near-top English") {
    val got = Chi2.topTermsByClass(corpus.toDF("doc_id", "lang", "text"),
      "lang", k = 3, minDf = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4), r.getInt(5)))
    val want = brute(corpus, 3, 2L)
    assert(got.map(x => (x._1, x._2, x._3)).toSet == want.toSet)
    val topFr = got.filter(x => x._1 == "fr" && x._4 == 1).head
    assert(Set("le", "chien").contains(topFr._2)) // both perfectly discriminative
    // ranks are 1..k dense per class
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.sameElements(1 to rows.size))
    }
  }

  test("a term in EVERY doc is excluded (undefined chi2)") {
    val docs = Seq(
      (1L, "a", "common alpha"), (2L, "a", "common beta"),
      (3L, "b", "common gamma"), (4L, "b", "common delta"))
    val got = Chi2.topTermsByClass(docs.toDF("doc_id", "lang", "text"),
      "lang", k = 10, minDf = 1L)
      .collect().map(_.getString(1)).toSet
    assert(!got.contains("common"))
  }

  test("df floor excludes rare terms") {
    val got = Chi2.topTermsByClass(corpus.toDF("doc_id", "lang", "text"),
      "lang", k = 10, minDf = 3L)
      .collect().map(_.getString(1)).toSet
    assert(!got.contains("dort")) // df = 1
    assert(got.forall(t => corpus.count(_._3.toLowerCase.split(" ").distinct.contains(t)) >= 3))
  }

  test("seeded corpus matches brute force; partition invariance") {
    val rnd = new scala.util.Random(41L)
    val vocabA = Seq("alpha", "beta", "gamma", "shared1", "shared2")
    val vocabB = Seq("delta", "eps", "zeta", "shared1", "shared2")
    val docs = (0 until 200).map { i =>
      val voc = if (i % 2 == 0) vocabA else vocabB
      val words = (0 until 6).map(_ => voc(rnd.nextInt(voc.size)))
      (i.toLong, if (i % 2 == 0) "ca" else "cb", words.mkString(" "))
    }
    val df = docs.toDF("doc_id", "lang", "text")
    val got = Chi2.topTermsByClass(df, "lang", k = 4, minDf = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    assert(got == brute(docs, 4, 5L).toSet)
    val again = Chi2.topTermsByClass(df.repartition(17), "lang", k = 4, minDf = 5L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(4))).toSet
    assert(again == got)
  }
}
