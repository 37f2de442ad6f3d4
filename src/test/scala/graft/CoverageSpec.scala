package graft

import graft.eval.Coverage
import org.scalatest.funsuite.AnyFunSuite

class CoverageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summary(recs: Seq[(Long, Long)], catalog: Seq[Long]) =
    Coverage.summary(recs.toDF("user_id", "item_id"), catalog.toDF("item_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).head

  test("coverage + Gini hand case: counts (3,1) over a 4-item catalog") {
    // item 10 recommended 3x, item 20 once -> sorted x = (1,3):
    // T = 1*1 + 3*2 = 7, n = 2, S = 4
    // gini_e6 = (2*7e6)//(2*4) - (1e6*3)//2 = 1750000 - 1500000 = 250000
    val recs = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
    assert(summary(recs, Seq(10L, 20L, 30L, 40L)) ==
      ((4L, 2L, 500000L, 250000L)))
  }

  test("uniform recommendation counts have Gini 0") {
    val recs = Seq((1L, 10L), (2L, 10L), (1L, 20L), (2L, 20L))
    val (_, n, _, gini) = summary(recs, Seq(10L, 20L))
    assert(n == 2L && gini == 0L)
  }

  test("Gini with a tie group matches the per-item-rank formula") {
    // counts (1,1,2): ranks 1,2 tie at value 1; T = 1*1 + 1*2 + 2*3 = 9
    // gini_e6 = (2*9e6)//(3*4) - (1e6*4)//3 = 1500000 - 1333333 = 166667
    val recs = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 30L))
    assert(summary(recs, Seq(10L, 20L, 30L))._4 == 166667L)
  }

  test("full catalog coverage is exactly 10^6") {
    assert(summary(Seq((1L, 10L), (1L, 20L)), Seq(10L, 20L))._3 == 1000000L)
  }

  test("novelty and ILD hand case") {
    // 3 distinct users in ratings; pop(10) = 3, pop(20) = 1
    val ratings = Seq((1L, 10L), (2L, 10L), (3L, 10L), (1L, 20L))
      .toDF("user_id", "item_id")
    val recs = Seq((1L, 10L), (1L, 20L), (2L, 10L)).toDF("user_id", "item_id")
    val sims = Seq((10L, 20L, 400000L)).toDF("item_a", "item_b", "sim")
    val out = Coverage.noveltyIld(recs, ratings, sims)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // user 1: novelty = round((log2(3/3) + log2(3/1)) / 2, 6);
    //         ild = 1e6 - 400000 div 1
    assert(out(1L) == ((0.792481, 600000L)))
    // user 2: one rec of the head item (pop 3 of 3 users -> novelty 0),
    // no pairs -> max-diversity sentinel
    assert(out(2L) == ((0.0, 1000000L)))
  }

  test("absent similarity pairs count as 0 in ILD") {
    val ratings = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "item_id")
    val recs = Seq((1L, 10L), (1L, 20L)).toDF("user_id", "item_id")
    val sims = spark.emptyDataFrame
      .select(lit(0L).as("item_a"), lit(0L).as("item_b"), lit(0L).as("sim"))
      .filter(lit(false))
    val out = Coverage.noveltyIld(recs, ratings, sims).collect()
    assert(out.length == 1 && out.head.getLong(2) == 1000000L)
  }

  private def lit(v: Any) = org.apache.spark.sql.functions.lit(v)
}
