package graft

import graft.text.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** weightedMinhashLsh: exact capped weighted Jaccard on returned
  * pairs, repetition sensitivity vs set Jaccard, cap clamping,
  * partition invariance. */
class WeightedMinhashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def wjac(a: String, b: String, cap: Int): Double = {
    def counts(s: String) = s.toLowerCase.split(" ").filter(_.nonEmpty)
      .groupBy(identity).map { case (w, xs) => w -> math.min(xs.length, cap) }
    val (ca, cb) = (counts(a), counts(b))
    val keys = ca.keySet ++ cb.keySet
    val mn = keys.toSeq.map(k => math.min(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
    val mx = keys.toSeq.map(k => math.max(ca.getOrElse(k, 0), cb.getOrElse(k, 0))).sum
    mn.toDouble / mx
  }

  private val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta"),
    (2L, "alpha beta gamma delta epsilon zeta eta iota"),     // near-dup of 1
    (3L, "buy " * 20 + "now special offer"),                  // heavy repetition
    (4L, "buy now special offer plus much other unrelated filler text here"),
    (5L, "buy " * 20 + "now special offer"),                  // exact dup of 3
    (6L, "completely different vocabulary entirely unrelated content")
  ).map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")

  test("returned pairs carry the exact capped weighted Jaccard (driver recount)") {
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Dedup.weightedMinhashLsh(spark, docs, nBands = 16,
      threshold = 0.2, rowsPerBand = 1, cap = 8).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b, j) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b)
      val want = BigDecimal(wjac(texts(a), texts(b), 8))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(j - want) < 1e-9, s"pair ($a,$b): got $j want $want")
      assert(wjac(texts(a), texts(b), 8) >= 0.2)
    }
  }

  test("exact dup found at wjaccard 1.0; repetition separates what set Jaccard conflates") {
    val got = Dedup.weightedMinhashLsh(spark, docs, 16, 0.2, 1, cap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((3L, 5L)) == 1.0)
    assert(got((1L, 2L)) > 0.7)
    // docs 3 and 4 share the full 4-word vocabulary of doc 3 (set
    // Jaccard 4/12 = 0.33) but repetition drags the weighted form down
    val j34 = wjac("buy " * 20 + "now special offer",
      "buy now special offer plus much other unrelated filler text here", 8)
    assert(j34 < 0.33, s"weighted $j34 should undercut the set Jaccard")
    got.get((3L, 4L)).foreach(j => assert(math.abs(j - BigDecimal(j34)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9))
  }

  test("cap clamps counts: past the cap, extra repetition is invisible") {
    val d = Seq((1L, "x " * 8 + "y"), (2L, "x " * 50 + "y"))
      .map { case (id, t) => (id, t.trim) }.toDF("doc_id", "text")
    val got = Dedup.weightedMinhashLsh(spark, d, 16, 0.5, 1, cap = 8).collect()
    assert(got.length == 1 && got(0).getDouble(2) == 1.0)
  }

  test("partition invariance") {
    val a = Dedup.weightedMinhashLsh(spark, docs, 8, 0.2, 2, cap = 4)
      .collect().map(_.toString).sorted.toSeq
    val b = Dedup.weightedMinhashLsh(spark, docs.repartition(7), 8, 0.2, 2, cap = 4)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("dense nibble-packed kernel == general token-join kernel (gate A/B)") {
    // denseVocabMax = 0 forces the general (doc, token)-join path on the
    // same inputs; the r14 dense kernel must be value-identical on every
    // (pair, wjaccard) — including vocabularies that straddle one long
    // (> 16 tokens → two packed longs)
    val rnd = new scala.util.Random(7)
    val words = (0 until 23).map(i => s"w$i")
    val d = (1L to 60L).map { id =>
      val n = 5 + rnd.nextInt(40)
      (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val dense = Dedup.weightedMinhashLsh(spark, d, 16, 0.2, 1, cap = 8)
      .collect().map(_.toString).sorted.toSeq
    val general = Dedup.weightedMinhashLsh(spark, d, 16, 0.2, 1, cap = 8,
        denseVocabMax = 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(dense.nonEmpty && dense == general)
  }
}
