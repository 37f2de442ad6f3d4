package graft

import graft.model.UserKnn
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class UserKnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ratings(rows: (Int, Int, Double)*): DataFrame =
    rows.map { case (u, i, r) => (u.toLong, i.toLong, r, 0L) }
      .toDF("user_id", "item_id", "rating", "ts")

  test("hand-computed neighbor-vote recommendations") {
    // u1:{a,b}, u2:{a,b,c}, u3:{b,c}; cooc (u1,u2)=2, (u2,u3)=2,
    // (u1,u3)=1 pruned; sims both 2e6 div 3 = 666666
    val r = ratings((1, 10, 5.0), (1, 20, 5.0),
      (2, 10, 5.0), (2, 20, 5.0), (2, 30, 5.0),
      (3, 20, 5.0), (3, 30, 5.0))
    val out = UserKnn.recs(r, 4.0, 50, 50, minCooc = 2, kNbrs = 10, kRecs = 5)
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getInt(3)))).toMap
    // u1 <- u2's unseen item c; u2 sees everything; u3 <- u2's item a
    assert(out == Map(1L -> ((30L, 666666L, 1)), 3L -> ((10L, 666666L, 1))))
  }

  test("per-item rater cap bounds the viral-item pair join") {
    // item 99 rated by 4 users; capPerItem=2 keeps the top-2 by
    // (rating DESC, user ASC) = users 1 and 2 -> only pair (1,2) forms
    val r = ratings((1, 99, 5.0), (2, 99, 5.0), (3, 99, 4.0), (4, 99, 4.0),
      (1, 10, 5.0), (2, 10, 5.0)) // a second shared item so cooc >= 2
    val rel = UserKnn.relevantCapped2(r, 4.0, 50, 2)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(rel == Set((1L, 99L), (2L, 99L), (1L, 10L), (2L, 10L)))
    val out = UserKnn.recs(r, 4.0, 50, 2, 2, 10, 5).collect()
    assert(out.isEmpty) // neighbors exist but all their items are seen
  }

  test("degrees and denominator reflect the double-capped set") {
    // u3 loses item 99 to the per-item cap, so deg(u3) = 2 survivors
    val r = ratings((1, 99, 5.0), (2, 99, 5.0), (3, 99, 4.0),
      (1, 10, 5.0), (3, 10, 5.0), (1, 20, 5.0), (3, 20, 5.0),
      (1, 30, 5.0)) // u1-only item -> the one recommendable candidate
    // capPerItem=2 on 99 keeps u1,u2; cooc(u1,u3) = |{10,20}| = 2;
    // degs 4 and 2 -> sim = 2e6 div (4+2-2) = 500000 (uncapped deg(u3)=3
    // would give 400000 — the assertion pins the capped denominator)
    val out = UserKnn.recs(r, 4.0, 50, 2, 2, 10, 5)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(out.toSet == Set((3L, 30L, 500000L)))
  }

  test("every ranking stage is a group-limited window (WindowGroupLimit fired)") {
    val r = ratings((1, 1, 5.0), (1, 2, 4.0), (2, 1, 4.0), (2, 2, 5.0))
    val plan = UserKnn.recs(r, 4.0, 50, 50, 1, 10, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
    // every Window must be a group-limited rank cut (immediate child =
    // WindowGroupLimit): an unguarded window is an unbounded per-group
    // sort. (ExistingRDD scans are now legitimate — the shared rel
    // checkpoint appears once per consumer site.)
    val lines = plan.linesIterator.toArray
    val unguarded = lines.indices.count { i =>
      lines(i).matches(""".*[+:]- Window \[.*""") &&
        (i + 1 >= lines.length || !lines(i + 1).contains("WindowGroupLimit"))
    }
    assert(unguarded == 0, s"unguarded window:\n$plan")
  }
}
