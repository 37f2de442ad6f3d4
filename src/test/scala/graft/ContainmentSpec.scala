package graft

import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.text.Dedup.containmentJoin]] (q191): the prefix filter must
  * be LOSSLESS (exact same pair set as the brute-force all-pairs
  * containment), and it must surface the near-subset pairs Jaccard
  * banding is structurally blind to. */
class ContainmentSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bruteContainment(docs: Seq[(Long, String)], k: Int,
                               tPm: Long, minSh: Int): Set[(Long, Long, Long, Long)] = {
    def sh(t: String): Set[String] = {
      val w = t.toLowerCase.split(" ", -1)
      if (w.length < k) Set.empty
      else (0 to w.length - k).map(i => w.slice(i, i + k).mkString(" ")).toSet
    }
    val m = docs.map { case (id, t) => id -> sh(t) }.toMap
    (for {
      (a, sa) <- m.toSeq; (b, sb) <- m.toSeq
      if a != b && sa.size >= minSh
      ni = (sa intersect sb).size.toLong
      if ni * 1000 >= tPm * sa.size
    } yield (a, b, sa.size.toLong, ni)).toSet
  }

  test("prefix filter is lossless: equals brute-force all-pairs containment") {
    val rnd = new scala.util.Random(17)
    val vocab = (0 until 40).map(i => s"tok$i")
    def sent(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // mix: random docs, planted subsets (short doc + boilerplate-
    // wrapped copy), exact copies
    val base = (1L to 40L).map(i => (i, sent(12 + rnd.nextInt(20))))
    val planted = base.take(8).map { case (id, t) =>
      (id + 100, s"${sent(4)} $t ${sent(5)}") } // contains the original
    val copies = base.slice(8, 12).map { case (id, t) => (id + 200, t) }
    val docs = base ++ planted ++ copies
    val got = Dedup.containmentJoin(docs.toDF("doc_id", "text"),
      shingleK = 3, tPerMille = 800L, minShingles = 5)
      .select("doc_a", "doc_b", "na", "ni").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val want = bruteContainment(docs, 3, 800L, 5)
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    assert(want.nonEmpty, "fixture planted no containment pairs")
  }

  test("finds high-containment LOW-Jaccard pairs that minhash banding misses") {
    // a 10-word doc wholly inside a 200-word doc: containment 1.0 but
    // Jaccard ~0.04 — far below any banding threshold
    val rnd = new scala.util.Random(3)
    val vocab = (0 until 60).map(i => s"w$i")
    def sent(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val small = sent(10)
    val docs = Seq((1L, small), (2L, s"${sent(95)} $small ${sent(95)}"),
      (3L, sent(50))).toDF("doc_id", "text")
    val cont = Dedup.containmentJoin(docs, 3, 900L, minShingles = 5).collect()
    assert(cont.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      s"subset pair not found: ${cont.mkString("; ")}")
    val jac = Dedup.minhashLsh(spark, docs, nBands = 8, shingleK = 3,
      threshold = 0.8)
    assert(jac.filter(col("doc_a") === 1 && col("doc_b") === 2).isEmpty,
      "Jaccard path unexpectedly surfaced the subset pair — witness broken")
    jac.unpersist()
  }
}
