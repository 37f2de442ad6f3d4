package graft

import graft.text.{Collocations, CoOccurrence}
import org.scalatest.funsuite.AnyFunSuite

class CoOccurrenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mat(docs: Seq[String], window: Int, minCount: Long = 1L): Map[(String, String, Int), Long] =
    CoOccurrence.matrix(docs.toDF("text"), "text", window, minCount)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) -> r.getLong(3))
      .toMap

  test("window=2 pairs with offsets") {
    assert(mat(Seq("a b c"), 2) == Map(
      ("a", "b", 1) -> 1L, ("b", "c", 1) -> 1L, ("a", "c", 2) -> 1L))
  }

  test("window clips at the doc end (no descending-sequence pairs)") {
    assert(mat(Seq("a b"), 3) == Map(("a", "b", 1) -> 1L))
    assert(mat(Seq("a"), 3).isEmpty)
  }

  test("repeated tokens accumulate per offset") {
    assert(mat(Seq("a a a"), 2) == Map(("a", "a", 1) -> 2L, ("a", "a", 2) -> 1L))
  }

  test("case folds and empty tokens drop without breaking adjacency") {
    assert(mat(Seq("A  b"), 1) == Map(("a", "b", 1) -> 1L))
  }

  test("minCount prunes") {
    assert(mat(Seq("x y", "x y", "x z"), 1, minCount = 2) == Map(("x", "y", 1) -> 2L))
  }

  test("window=1 counts equal the Collocations bigram counts") {
    val docs = (1 to 30).map(i => s"w${i % 5} w${(i + 1) % 5} w${(i + 2) % 5} w${i % 3}")
    val co = mat(docs, 1).map { case ((a, b, _), n) => (a, b) -> n }
    val ph = Collocations.phrases(docs.toDF("text"), "text", minCount = 1, delta = 0)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(co == ph)
  }

  test("window must be positive") {
    intercept[IllegalArgumentException] {
      CoOccurrence.matrix(Seq("a b").toDF("text"), "text", 0)
    }
  }

  test("pmi: hand-computed log2 association over the aggregated matrix") {
    // pairs within window 3: (a,b)x2, (a,c)x1; unigrams a:3 b:2 c:1, N=6
    val docs = Seq("a b", "a b", "a c").toDF("text")
    val out = CoOccurrence.pmi(docs, "text", window = 3, minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    // pmi(a,b) = log2(2*6 / (3*2)) = 1; pmi(a,c) = log2(1*6 / (3*1)) = 1
    assert(out == Map(("a", "b") -> ((2L, 1.0)), ("a", "c") -> ((1L, 1.0))))
    // minCount prunes the AGGREGATED count
    assert(CoOccurrence.pmi(docs, "text", 3, 2L).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq == Seq(("a", "b")))
  }

  test("pmi aggregates across offsets before pruning") {
    // (a,b) occurs once at offset 1 and once at offset 2 -> n = 2
    // survives minCount 2 even though no single offset reaches it
    val docs = Seq("a b", "a x b").toDF("text")
    val ab = CoOccurrence.pmi(docs, "text", 3, 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(ab.toSeq == Seq(("a", "b", 2L)))
  }

  test("frequent triples: a-priori counts exactly, sub-pair prune removes weak triples") {
    // baskets (all ratings relevant): u1 {1,2,3}, u2 {1,2,3}, u3 {1,2,4}
    val ratings = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L))
      .map { case (u, i) => (u, i, 5.0) }.toDF("user_id", "item_id", "rating")
    val out = graft.model.Baskets.frequentTriples(ratings, 4.0, 50, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    // {1,2,3} support 2 -> frequent; {1,2,4}: pairs (1,4)/(2,4) have
    // support 1 -> pruned before counting
    assert(out == Map((1L, 2L, 3L) -> 2L))
    // minSupport 3 empties it
    assert(graft.model.Baskets.frequentTriples(ratings, 4.0, 50, 3).count() == 0)
  }
}
