package graft

import graft.model.MarkovNextItem
import org.scalatest.funsuite.AnyFunSuite

class MarkovNextItemSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long)], minCount: Long = 1L, k: Int = 5) =
    MarkovNextItem.transitions(
      rows.map { case (u, i, t) => (u, i, 5.0, t) }
        .toDF("user_id", "item_id", "rating", "ts"),
      minCount, k)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getInt(3)))).toMap

  test("consecutive transitions in timestamp order; self-transitions dropped") {
    // u1 timeline: A B A A C -> pairs A->B, B->A, (A->A dropped), A->C
    val out = run(Seq((1L, 10L, 1L), (1L, 20L, 2L), (1L, 10L, 3L),
      (1L, 10L, 4L), (1L, 30L, 5L)))
    // within prev=A the tie (cnt 1 each) breaks by next item: B rank 1
    assert(out == Map((10L, 20L) -> ((1L, 1)), (20L, 10L) -> ((1L, 1)),
      (10L, 30L) -> ((1L, 2))))
  }

  test("counts accumulate across users; minCount prunes; rank orders by count") {
    val rows = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), // A->B
      (2L, 10L, 1L), (2L, 20L, 2L), // A->B
      (3L, 10L, 1L), (3L, 30L, 2L)) // A->C (count 1)
    val all = run(rows)
    assert(all((10L, 20L)) == ((2L, 1)) && all((10L, 30L)) == ((1L, 2)))
    assert(run(rows, minCount = 2L).keySet == Set((10L, 20L)))
  }

  test("equal timestamps order by item_id (deterministic walk)") {
    // both at ts 1: item order 10 then 20 -> 10->20, never 20->10
    val out = run(Seq((1L, 20L, 1L), (1L, 10L, 1L)))
    assert(out.keySet == Set((10L, 20L)))
  }

  test("recommend: last item looks up transitions, seen items excluded") {
    // transitions (minCount 1): A->B x2 (u1, u2), B->C (u1)
    // u1 last = C -> no outgoing -> absent
    // u2 last = B -> candidates {C}; u2 hasn't seen C -> recommended
    // u3 last = A -> candidates {B, C? no: A->B only} minus seen B -> absent
    val rows = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L),
      (3L, 20L, 1L), (3L, 10L, 2L)) // u3: B then A (last = A); saw B
    val out = MarkovNextItem.recommend(
      rows.map { case (u, i, t) => (u, i, 5.0, t) }
        .toDF("user_id", "item_id", "rating", "ts"),
      minCount = 1L, kTrans = 5, k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3))))
    assert(out.toMap == Map(2L -> ((30L, 1L, 1))))
  }

  private def df(rows: Seq[(Long, Long, Long)]) =
    rows.map { case (u, i, t) => (u, i, 5.0, t) }
      .toDF("user_id", "item_id", "rating", "ts")

  test("order-2: consecutive triples, nxt == prev1 dropped, <3-event users skipped") {
    // u1: A B C D -> (A,B,C), (B,C,D); u2: A B B -> (A,B,B) dropped
    // (nxt == prev1); u3: A B (too short)
    val out = MarkovNextItem.transitions2(df(Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L), (1L, 40L, 4L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 20L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L))), minCount = 1L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(out.toSet == Set((10L, 20L, 30L, 1L, 1), (20L, 30L, 40L, 1L, 1)))
  }

  test("order-2 minCount prunes the context tail (the Baskets discipline)") {
    // (A,B)->C twice, (A,B)->D once
    val rows = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L), (3L, 40L, 3L))
    val out = MarkovNextItem.transitions2(df(rows), minCount = 2L, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == Set((10L, 20L, 30L, 2L)))
  }

  test("backoff serving: ord 2 when the order-2 context has unseen candidates, else ord 1") {
    // trained on ALL histories (minCount 1):
    //   t1: A->B cnt3, B->C cnt2, D->B cnt1; t2: (A,B)->C cnt2
    //   u1/u2: A B C -> context (B,C): no t2 entry; t1 on C: nothing
    //          -> absent
    //   u3: A B      -> context (A,B): t2 hit C, unseen by u3 -> ord 2
    //   u4: D B      -> context (D,B): no t2 entry -> back off to t1
    //          on last item B -> C unseen by u4 -> ord 1
    val rows = Seq(
      (1L, 10L, 1L), (1L, 20L, 2L), (1L, 30L, 3L),
      (2L, 10L, 1L), (2L, 20L, 2L), (2L, 30L, 3L),
      (3L, 10L, 1L), (3L, 20L, 2L),
      (4L, 40L, 1L), (4L, 20L, 2L))
    val out = MarkovNextItem.recommendBackoff(df(rows), minCount = 1L, kTrans = 5, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3), r.getInt(4)))
    val byUser = out.groupBy(_._1)
    assert(byUser.keySet == Set(3L, 4L), s"served users: ${byUser.keySet}")
    assert(byUser(3L).toSet == Set((3L, 30L, 2, 1)), s"u3: ${byUser(3L).toSeq}")
    assert(byUser(4L).toSet == Set((4L, 30L, 1, 1)), s"u4: ${byUser(4L).toSeq}")
  }
}
