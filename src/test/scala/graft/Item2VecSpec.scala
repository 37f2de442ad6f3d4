package graft

import graft.model.Item2Vec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Item2VecSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two co-consumption clusters over disjoint item halves; held-out
    * in-cluster items must be recommended over out-cluster ones. */
  private def clustered = (for {
    u <- 0 until 20; i <- 0 until 24
    if (u < 10) == (i < 12) && (u * 5 + i) % 10 != 0
  } yield (u.toLong, i.toLong, 5.0)).toDF("user_id", "item_id", "rating")

  test("item2vec recovers co-consumption clusters (every held-out item served first)") {
    // per user the held-out in-cluster set has 1 OR 2 items (the
    // (u*5+i)%10==0 pattern yields {0,10}/{5}/{20}/{15} depending on
    // parity and half) — the model must serve EXACTLY that set at the
    // top ranks, before any out-cluster filler. 100 epochs: this
    // corpus is ~200 tokens/epoch; probed separation cos(within)≈0.72
    // vs cos(cross)≈0.09 there (no separation at 10 epochs).
    val out = Item2Vec.recs(spark, clustered, minRating = 1.0,
      dim = 8, window = 16, epochs = 100, lr = 0.05, negative = 5,
      seed = 42L, k = 3, pinOrder = true)
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong, r.getInt(2)))
    val byUser = out.groupBy(_._1)
    assert(byUser.size == 20)
    (0 until 20).foreach { u =>
      val heldOut = (0 until 24).filter(i =>
        (u < 10) == (i < 12) && (u * 5 + i) % 10 == 0).map(_.toLong).toSet
      assert(heldOut.nonEmpty && heldOut.size <= 2)
      val top = byUser(u.toLong).sortBy(_._3).take(heldOut.size).map(_._2).toSet
      assert(top == heldOut, s"u=$u served $top, held-out was $heldOut")
    }
  }

  test("pinOrder runs are bit-identical (golden discipline)") {
    def run() = Item2Vec.recs(spark, clustered, minRating = 1.0,
      dim = 4, window = 16, epochs = 2, lr = 0.05, negative = 3,
      seed = 7L, k = 3, pinOrder = true)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(run() == run())
  }

  test("fold-frame quality: item2vec earns nonzero MAP/nDCG@5 on the ml-100k-shaped fixture") {
    val r = MlFixture.ratings(spark, 42L)
    val folded = graft.split.EdgeSplits.kFold(r, 5, "user", Seq(col("item_id")))
    val train = folded.filter(col("fold") =!= 1).select("user_id", "item_id", "rating")
    val test = folded.filter(col("fold") === 1).select("user_id", "item_id", "rating")
    // full-basket window (the paper's set context) is what earns the
    // signal: probed MAP 0.0505 here vs 0.0024 at window 16 — the best
    // embedding-model number on this fixture (node2vec 0.016, BPR 0.011)
    val recs = Item2Vec.recs(spark, train, minRating = 4.0, dim = 32, window = 100,
      epochs = 5, lr = 0.025, negative = 5, seed = 42L, k = 5)
    val m = graft.eval.Metrics.meansAtK(
      recs.select(col("user_id"), col("item_id"), col("rank")), test, 5, 4.0)
      .collect().head
    val map = m.getDouble(0); val ndcg = m.getDouble(1)
    info(f"item2vec fixture MAP@5=$map%.5f nDCG@5=$ndcg%.5f")
    assert(map > 0.02 && map <= 1.0, s"map=$map")
    assert(ndcg > 0.005 && ndcg <= 1.0, s"ndcg=$ndcg")
  }

  test("recs contract via the registry: ranks 1..k, rated items excluded") {
    val ratings = (for { u <- 0 until 8; i <- 0 until 12 if (u + i) % 3 != 0 }
      yield (u.toLong, i.toLong, ((u * i) % 5 + 1).toDouble))
      .toDF("user_id", "item_id", "rating")
    val out = graft.model.Recommenders.registry("item2vec")(Map(
      "embedding_dim" -> "4", "epochs" -> "2", "min_rating" -> "1.0",
      "pin_order" -> "true"))
      .train(spark, ratings).recommend(3)
      .collect().map(r => (r.getString(0).toLong, r.getString(1).toLong, r.getInt(2)))
    val seen = ratings.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty)
    out.foreach { case (u, i, rk) =>
      assert(rk >= 1 && rk <= 3)
      assert(!seen((u, i)), s"recommended rated item $i to $u")
    }
  }
}
