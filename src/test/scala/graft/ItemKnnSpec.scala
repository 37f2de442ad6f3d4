package graft

import graft.model.ItemKnn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ItemKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratings(rows: (Int, Int, Double)*): DataFrame =
    rows.map { case (u, i, r) => (u.toLong, i.toLong, r, 0L) }
      .toDF("user_id", "item_id", "rating", "ts")

  test("hand-computed Jaccard sims: cooc, degrees, scaled division") {
    // relevant (>=4): u1:{a=1,b=2}, u2:{1,2,3}, u3:{2,3}
    // deg: 1->2, 2->3, 3->2
    // cooc: (1,2)=2 (1,3)=1 (2,3)=2 ; minCooc=2 drops (1,3)
    // sim(1,2) = 2e6 // (2+3-2) = 666666 ; sim(2,3) = 2e6 // (3+2-2) = 666666
    val rel = ItemKnn.relevantCapped(
      ratings((1, 1, 5.0), (1, 2, 4.0), (1, 9, 1.0),
              (2, 1, 4.0), (2, 2, 5.0), (2, 3, 4.0),
              (3, 2, 4.0), (3, 3, 5.0)), 4.0, 50)
    val sims = ItemKnn.similarities(rel, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(5)))).toMap
    assert(sims.keySet == Set((1L, 2L), (2L, 3L)))
    assert(sims((1L, 2L)) == ((2L, 666666L)))
    assert(sims((2L, 3L)) == ((2L, 666666L)))
  }

  test("recommendation scores sum sims over the user's items; seen items excluded") {
    // u3 rated {2,3}; item 1 is a neighbor of both 2 (sim 666666) and
    // nothing else -> score(u3, 1) = sim(1,2) + nothing (cooc(1,3)
    // pruned) = 666666; items 2,3 are seen so never recommended
    val r = ratings((1, 1, 5.0), (1, 2, 4.0), (1, 9, 1.0),
                    (2, 1, 4.0), (2, 2, 5.0), (2, 3, 4.0),
                    (3, 2, 4.0), (3, 3, 5.0))
    val recs = ItemKnn.recs(r, 4.0, 50, 2, 10, 5)
    val u3 = recs.filter($"user_id" === 3L).collect()
    assert(u3.map(_.getLong(1)).toSet == Set(1L))
    assert(u3.head.getLong(2) == 666666L)
    // global: no (user, item) in recs may appear in the rating table
    val leaked = recs.join(r, Seq("user_id", "item_id"), "left_semi").count()
    assert(leaked == 0L)
  }

  test("per-user cap keeps top-cap by (rating DESC, item_id) and bounds pair emission") {
    // u1 has 4 relevant items, cap=2 keeps {(5.0, 10), (4.5, 11)}
    val r = ratings((1, 10, 5.0), (1, 11, 4.5), (1, 12, 4.5), (1, 13, 4.0))
    val rel = ItemKnn.relevantCapped(r, 4.0, 2).collect().map(_.getLong(1)).toSet
    assert(rel == Set(10L, 11L)) // 11 < 12 wins the 4.5 tie
    // capped set of size c emits c(c-1)/2 pairs at minCooc=1
    val pairs = ItemKnn.similarities(ItemKnn.relevantCapped(r, 4.0, 3), 1).count()
    assert(pairs == 3L)
  }

  test("pipeline == independent SQL replay on random data (partitioning invariant)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(600) { _ =>
      (rnd.nextInt(40), rnd.nextInt(25), 1.0 + rnd.nextInt(5))
    }.distinct.map { case (u, i, r) => (u.toLong, i.toLong, r, 0L) }
    val df = rows.toDF("user_id", "item_id", "rating", "ts")
      .groupBy("user_id", "item_id").agg(max("rating").as("rating"), max("ts").as("ts"))
    df.createOrReplaceTempView("iknn_r")
    val sqlRecs = spark.sql(
      """WITH rel AS (
        |  SELECT user_id, item_id FROM (
        |    SELECT user_id, item_id,
        |           row_number() OVER (PARTITION BY user_id ORDER BY rating DESC, item_id) AS rn
        |    FROM iknn_r WHERE rating >= 4.0) WHERE rn <= 5
        |), ideg AS (SELECT item_id, count(*) AS deg FROM rel GROUP BY 1
        |), cooc AS (
        |  SELECT a.item_id AS item_a, b.item_id AS item_b, count(*) AS cooc
        |  FROM rel a JOIN rel b ON a.user_id = b.user_id AND a.item_id < b.item_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2
        |), sims AS (
        |  SELECT item_a, item_b, cooc * 1000000L div (da.deg + db.deg - cooc) AS sim
        |  FROM cooc JOIN ideg da ON da.item_id = item_a JOIN ideg db ON db.item_id = item_b
        |), nbrs AS (
        |  SELECT item_id, nbr_id, sim FROM (
        |    SELECT item_id, nbr_id, sim,
        |           row_number() OVER (PARTITION BY item_id ORDER BY sim DESC, nbr_id) AS rn
        |    FROM (SELECT item_a AS item_id, item_b AS nbr_id, sim FROM sims
        |          UNION ALL SELECT item_b, item_a, sim FROM sims)) WHERE rn <= 3
        |), cand AS (
        |  SELECT r.user_id, n.nbr_id AS item_id, SUM(n.sim) AS score
        |  FROM rel r JOIN nbrs n ON n.item_id = r.item_id GROUP BY 1, 2
        |), unseen AS (
        |  SELECT c.* FROM cand c LEFT ANTI JOIN iknn_r s
        |    ON s.user_id = c.user_id AND s.item_id = c.item_id
        |)
        |SELECT user_id, item_id, score, CAST(rn AS INT) AS rank FROM (
        |  SELECT user_id, item_id, score,
        |         row_number() OVER (PARTITION BY user_id ORDER BY score DESC, item_id) AS rn
        |  FROM unseen) WHERE rn <= 2""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    for (parts <- Seq(1, 7)) {
      val got = ItemKnn.recs(df.repartition(parts), 4.0, 5, 2, 3, 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(got == sqlRecs, s"parts=$parts")
    }
  }

  test("every ranking stage is a group-limited window (WindowGroupLimit fired)") {
    val r = ratings((1, 1, 5.0), (1, 2, 4.0), (2, 1, 4.0), (2, 2, 5.0))
    val plan = ItemKnn.recs(r, 4.0, 50, 1, 10, 5)
      .queryExecution.executedPlan.toString
    // every TopK rank must ride the WindowGroupLimit partial/final pair
    // (bounded shuffle), never a plain unbounded WindowExec, and never
    // the old RDD boundary (opaque ExistingRDD scan)
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit:\n$plan")
    assert(!plan.contains("ExistingRDD"), s"unexpected RDD boundary:\n$plan")
  }

  private def ratingsTs(rows: (Int, Int, Double, Long)*): DataFrame =
    rows.map { case (u, i, r, t) => (u.toLong, i.toLong, r, t) }
      .toDF("user_id", "item_id", "rating", "ts")

  test("covisitation: window predicate gates pairs, support prunes, lists symmetric") {
    val day = 86400000L
    val r = ratingsTs(
      (1, 10, 5.0, 0), (1, 20, 5.0, day), (1, 30, 5.0, 100 * day),
      (2, 10, 5.0, 5 * day), (2, 20, 5.0, 7 * day),
      (2, 30, 4.0, 200 * day))
    val out = ItemKnn.covisitation(r, 4.0, 50, windowMs = 90 * day, minCooc = 2, k = 5)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> ((x.getLong(2), x.getInt(3)))).toMap
    // only (10,20) co-occurs twice WITHIN 90 days; (x,30) pairs are
    // outside the window for both users
    assert(out == Map((10L, 20L) -> ((2L, 1)), (20L, 10L) -> ((2L, 1))))
    // with the window removed, (10,30)/(20,30) pairs reappear at minCooc=1
    val open = ItemKnn.covisitation(r, 4.0, 50, Long.MaxValue / 2, 1, 5)
      .collect().map(_.getLong(0)).toSet
    assert(open == Set(10L, 20L, 30L))
  }

  test("trending: exact half-life bucket weights, recency beats raw count, old clamps to 0") {
    import graft.model.Trending
    val hl = 1000L
    val mx = 100000L
    val inter = Seq(
      (10L, mx), (10L, mx - hl),           // 1e6 + 5e5 = 1.5e6, n=2
      (20L, mx - 2 * hl), (20L, mx - 2 * hl), (20L, mx - 2 * hl), // 3x 25e4 = 75e4, n=3
      (30L, mx - 41 * hl))                 // age 41 half-lives -> weight 0
      .toDF("item_id", "ts")
    val out = Trending.trending(inter, hl, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((10L, 1500000L, 2L), (20L, 750000L, 3L), (30L, 0L, 1L)))
  }
}
