package graft

import graft.text.Collocations
import org.scalatest.funsuite.AnyFunSuite

class CollocationsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def phrases(docs: Seq[String], minCount: Long, delta: Long,
                      maxVocab: Long = 1000000L): Map[(String, String), (Long, Long)] =
    Collocations.phrases(docs.toDF("text"), "text", minCount, delta, maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

  test("hand-computed lift on a 3-word corpus") {
    // words: [x y x y], [x y z] -> uni x:3 y:3 z:1, N=7
    // bigrams: (x,y):3 (y,x):1 (y,z):1; minCount=2 keeps only (x,y)
    val m = phrases(Seq("x y x y", "x y z"), minCount = 2, delta = 1)
    assert(m == Map(("x", "y") -> ((3L, (3L - 1L) * 7L * 10000L / (3L * 3L)))))
  }

  test("repeated spaces drop empty tokens without breaking adjacency") {
    val m = phrases(Seq("x  y", "x y"), minCount = 2, delta = 0)
    assert(m.contains(("x", "y")) && m(("x", "y"))._1 == 2L)
  }

  test("case folds before counting") {
    val m = phrases(Seq("X y", "x Y"), minCount = 2, delta = 0)
    assert(m(("x", "y"))._1 == 2L)
  }

  test("single-word docs add to N but emit no bigrams") {
    // with the extra 'x' doc: N=8, uni x:4 -> lift shrinks
    val with1 = phrases(Seq("x y x y", "x y z", "x"), minCount = 2, delta = 1)
    assert(with1(("x", "y")) == ((3L, (3L - 1L) * 8L * 10000L / (4L * 3L))))
  }

  test("non-broadcast vocab path matches the broadcast plan") {
    val docs = (1 to 50).map(i => s"w${i % 7} w${(i + 1) % 7} w${(i + 2) % 7}")
    assert(phrases(docs, 3, 1) == phrases(docs, 3, 1, maxVocab = 0))
  }

  test("minCount must exceed delta") {
    intercept[IllegalArgumentException] {
      Collocations.phrases(Seq("a b").toDF("text"), "text", minCount = 5, delta = 5)
    }
  }
}
