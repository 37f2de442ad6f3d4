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
}
