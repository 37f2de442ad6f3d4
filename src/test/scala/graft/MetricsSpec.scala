package graft

import graft.eval.Metrics
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // hand-worked example, mirroring map.py / ndcg.py semantics:
  // user 1: recs [10, 11, 12, 13, 14]; relevant test = {10 (r5), 12 (r4), 99 (r4)}
  //   AP@5 = (1/1 + 2/3) / min(3,5) = (1 + 0.6667)/3 = 0.555556
  //   DCG  = 5/log2(2) + 4/log2(4) = 5 + 2 = 7
  //   IDCG = 5/log2(2) + 4/log2(3) + 4/log2(4) = 5 + 2.523719 + 2 = 9.523719
  // user 2: no relevant items (rating < threshold) -> excluded entirely
  private val recs = Seq(
    (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3), (1L, 13L, 4), (1L, 14L, 5),
    (2L, 10L, 1), (2L, 11L, 2)
  ).toDF("user_id", "item_id", "rank")
  private val testDf = Seq(
    (1L, 10L, 5.0), (1L, 12L, 4.0), (1L, 99L, 4.0),
    (2L, 10L, 2.0) // below threshold 4.0
  ).toDF("user_id", "item_id", "rating")

  test("AP@k matches the hand-worked value; no-relevant users excluded (map.py:18-33, metric.py:33-34)") {
    val ap = Metrics.apPerUser(recs, testDf, 5, 4.0).collect()
    assert(ap.length == 1)
    assert(ap.head.getLong(0) == 1L)
    assert(math.abs(ap.head.getDouble(1) - (1.0 + 2.0 / 3) / 3) < 1e-12)
  }

  test("nDCG@k: graded DCG over recs, IDCG from rating-desc relevant list (ndcg.py:21-48)") {
    val nd = Metrics.ndcgPerUser(recs, testDf, 5, 4.0).collect()
    assert(nd.length == 1)
    val idcg = 5.0 / 1 + 4.0 / (math.log(3) / math.log(2)) + 4.0 / 2
    assert(math.abs(nd.head.getDouble(1) - 7.0 / idcg) < 1e-12)
  }

  test("IDCG truncates at k (ndcg.py:40-44)") {
    val manyRel = (1 to 10).map(i => (1L, 100L + i, 5.0)).toDF("user_id", "item_id", "rating")
    val oneRec = Seq((1L, 101L, 1)).toDF("user_id", "item_id", "rank")
    val nd = Metrics.ndcgPerUser(oneRec, manyRel, 3, 4.0).first().getDouble(1)
    val idcg3 = 5.0 / 1 + 5.0 / (math.log(3) / math.log(2)) + 5.0 / 2
    assert(math.abs(nd - 5.0 / idcg3) < 1e-12)
  }

  test("AP denominator is min(|relevant|, k) (map.py:32)") {
    // 6 relevant items, k=5, all 5 recs hit -> AP = (1+1+1+1+1)/5 = 1.0
    val rel6 = (1 to 6).map(i => (1L, i.toLong, 5.0)).toDF("user_id", "item_id", "rating")
    val hit5 = (1 to 5).map(i => (1L, i.toLong, i)).toDF("user_id", "item_id", "rank")
    val ap = Metrics.apPerUser(hit5, rel6, 5, 4.0).first().getDouble(1)
    assert(math.abs(ap - 1.0) < 1e-12)
  }

  test("duplicate recommendations are not re-counted as hits (map.py:29)") {
    // item 10 recommended twice: second occurrence consumes rank 2 but
    // adds no hit; AP = (1/1) / min(1, 5) from the single relevant item
    val dupRecs = Seq((1L, 10L, 1), (1L, 10L, 2), (1L, 11L, 3))
      .toDF("user_id", "item_id", "rank")
    val t = Seq((1L, 10L, 5.0)).toDF("user_id", "item_id", "rating")
    val ap = Metrics.apPerUser(dupRecs, t, 5, 4.0).first().getDouble(1)
    assert(math.abs(ap - 1.0) < 1e-12)
  }

  test("metrics are bounded in [0, 1]") {
    val ap = Metrics.apPerUser(recs, testDf, 5, 4.0).collect().map(_.getDouble(1))
    val nd = Metrics.ndcgPerUser(recs, testDf, 5, 4.0).collect().map(_.getDouble(1))
    (ap ++ nd).foreach(v => assert(v >= 0.0 && v <= 1.0))
  }

  test("serendipity@k counts relevant-AND-unexpected only") {
    val r = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), // user 1: A B C
      (2L, 10L, 1)) // user 2 has no relevant test items -> absent
      .toDF("user_id", "item_id", "rank")
    val prim = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "item_id")
    val t = Seq((1L, 20L, 5.0), (1L, 30L, 4.0), (1L, 40L, 5.0))
      .toDF("user_id", "item_id", "rating")
    val out = Metrics.serendipityAtK(r, prim, t, 3, 4.0)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // item 20: relevant but in the primitive -> expected, not counted;
    // item 30: relevant and absent from the primitive -> counted;
    // item 10: unexpected but irrelevant -> not counted
    assert(out == Map(1L -> ((1L, 1000000L / 3))))
  }

  test("serendipity@k cuts a rank-bearing baseline to its top-k (r10 advice)") {
    val r = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
      .toDF("user_id", "item_id", "rank")
    // item 30 sits at baseline rank 4 > k=3 — beyond the baseline's
    // top-k it is NOT "expected", so a relevant rec of it counts
    val prim = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 50L, 3), (1L, 30L, 4))
      .toDF("user_id", "item_id", "rank")
    val t = Seq((1L, 20L, 5.0), (1L, 30L, 4.0)).toDF("user_id", "item_id", "rating")
    val out = Metrics.serendipityAtK(r, prim, t, 3, 4.0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(out == Map(1L -> 1L))
    // same frame WITHOUT the cut (uncut rank-less contract violation
    // shape) would have treated 30 as expected -> 0 serendipitous
    val outUncut = Metrics.serendipityAtK(r, prim.drop("rank"), t, 3, 4.0)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(outUncut == Map(1L -> 0L))
  }

  test("fused meansAtK equals the standalone MAP@k and nDCG@k means") {
    // hand-worked fixture PLUS a duplicate-recommendation user so the
    // fused path's hit dedup and un-deduped DCG are both exercised
    val recs2 = recs.union(Seq((3L, 20L, 1), (3L, 20L, 2), (3L, 21L, 3))
      .toDF("user_id", "item_id", "rank"))
    val test2 = testDf.union(Seq((3L, 20L, 5.0)).toDF("user_id", "item_id", "rating"))
    for (k <- Seq(2, 5)) {
      val m = Metrics.mapAtK(recs2, test2, k, 4.0).first().getDouble(0)
      val n = Metrics.ndcgAtK(recs2, test2, k, 4.0).first().getDouble(0)
      val fused = Metrics.meansAtK(recs2, test2, k, 4.0).first()
      assert(math.abs(fused.getDouble(0) - m) < 1e-12, s"map k=$k")
      assert(math.abs(fused.getDouble(1) - n) < 1e-12, s"ndcg k=$k")
    }
  }
}
