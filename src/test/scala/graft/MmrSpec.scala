package graft

import graft.model.Mmr
import org.scalatest.funsuite.AnyFunSuite

class MmrSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(cands: Seq[(Long, Long, Long)], sims: Seq[(Long, Long, Long)], k: Int) =
    Mmr.diversify(cands.toDF("user_id", "item_id", "score"),
      sims.toDF("item_a", "item_b", "sim"), k)
      .collect()
      .map(r => (r.getLong(0), r.getInt(2)) -> ((r.getLong(1), r.getLong(3))))
      .toMap

  test("greedy hand case: similarity demotes the 2nd-most-relevant item") {
    // A=100, B=90, C=80; sim(A,B)=50, sim(A,C)=5
    // pick1 A(100); pick2: B:90-50=40 < C:80-5=75 -> C; pick3 B:90-50=40
    val out = run(
      Seq((1L, 10L, 100L), (1L, 20L, 90L), (1L, 30L, 80L)),
      Seq((10L, 20L, 50L), (10L, 30L, 5L)), 3)
    assert(out == Map((1L, 1) -> ((10L, 100L)), (1L, 2) -> ((30L, 75L)),
      (1L, 3) -> ((20L, 40L))))
  }

  test("max (not sum) over the picked set, symmetric lookup") {
    // after picking A and C, B's penalty is max(sim(B,A)=10, sim(B,C)=60)
    val out = run(
      Seq((1L, 10L, 100L), (1L, 20L, 50L), (1L, 30L, 99L)),
      Seq((10L, 20L, 10L), (20L, 30L, 60L)), 3)
    assert(out((1L, 3)) == ((20L, 50L - 60L))) // negative mmr2x is legal
  }

  test("mmr ties break by item_id ascending") {
    val out = run(Seq((1L, 20L, 70L), (1L, 10L, 70L)), Seq.empty, 2)
    assert(out((1L, 1)) == ((10L, 70L)) && out((1L, 2)) == ((20L, 70L)))
  }

  test("k beyond the list emits the whole list; no edges = relevance order") {
    val out = run(Seq((1L, 10L, 5L), (1L, 20L, 9L)), Seq.empty, 5)
    assert(out.size == 2 && out((1L, 1)) == ((20L, 9L)) && out((1L, 2)) == ((10L, 5L)))
  }

  test("users are independent") {
    val out = run(
      Seq((1L, 10L, 100L), (1L, 20L, 90L), (2L, 20L, 7L)),
      Seq((10L, 20L, 999999L)), 2)
    assert(out((1L, 2)) == ((20L, 90L - 999999L)))
    assert(out((2L, 1)) == ((20L, 7L))) // user 2 unaffected by user 1's picks
  }
}
