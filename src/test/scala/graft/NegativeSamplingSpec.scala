package graft

import graft.model.NegativeSampling
import graft.util.DenseIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NegativeSamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("DenseIndex: dense 1..N in key order, invariant to input partitioning") {
    val keys = (1 to 500).map(i => i * 7L % 501) // distinct, shuffled-ish
    for (parts <- Seq(1, 4, 13)) {
      val df = keys.toDF("item_id").repartition(parts)
      val got = DenseIndex.byKey(df, "item_id")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap
      assert(got == want, s"parts=$parts")
    }
  }

  private val ratings = Seq(
    (1L, 10L), (1L, 20L), (1L, 30L),
    (2L, 10L),
    (3L, 40L), (3L, 50L))
    .map { case (u, i) => (u, i, 5.0) }.toDF("user_id", "item_id", "rating")

  test("negatives are never seen items, ranks contiguous from 1, at most k") {
    val out = NegativeSampling.uniformNegatives(ratings, k = 3, oversample = 4, seed = 1L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val seen = Set((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (3L, 40L), (3L, 50L))
    val catalog = Set(10L, 20L, 30L, 40L, 50L)
    out.foreach { case (u, i, _) =>
      assert(!seen((u, i)), s"seen item sampled: $u $i")
      assert(catalog(i))
    }
    out.groupBy(_._1).foreach { case (u, rows) =>
      val ranks = rows.map(_._3).sorted.toSeq
      assert(ranks == (1 to ranks.size), s"user $u ranks $ranks")
      assert(ranks.size <= 3)
    }
  }

  test("same seed reproduces the draw; a different seed changes it") {
    def run(seed: Long) = NegativeSampling.uniformNegatives(ratings, 3, 4, seed)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(run(5L) == run(5L))
    assert((1L to 10L).exists(s => run(s) != run(5L))) // not constant in the seed
  }

  test("duplicate draws collapse to the FIRST draw index (rank order pinned)") {
    // single user, single unseen item -> whatever the draws, one row rank 1
    val r1 = Seq((1L, 10L, 5.0)).toDF("user_id", "item_id", "rating")
      .union(Seq((2L, 99L, 5.0)).toDF("user_id", "item_id", "rating"))
    val out = NegativeSampling.uniformNegatives(r1, k = 4, oversample = 8, seed = 3L)
      .filter(col("user_id") === 1L).collect()
    assert(out.length == 1 && out.head.getLong(1) == 99L && out.head.getInt(2) == 1)
  }
}
