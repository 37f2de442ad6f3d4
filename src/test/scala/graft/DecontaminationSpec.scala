package graft

import graft.text.Decontamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val evalDocs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog today"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")

  test("exact copy flagged with full gram count; sub-threshold overlap passes") {
    val train = Seq(
      // 100: verbatim copy of eval 1 (10 words -> 6 distinct 5-grams)
      (100L, "the quick brown fox jumps over the lazy dog today"),
      // 101: shares exactly TWO 5-grams with eval 1 (threshold is 3)
      (101L, "xx the quick brown fox jumps yy zz ww vv"),
      // 102: no overlap at all
      (102L, "completely different words with no shared sequences here at all"),
      // 103: overlaps eval 2 with three grams (7 shared words -> 3 5-grams)
      (103L, "alpha beta gamma delta epsilon zeta eta something else")
    ).toDF("doc_id", "text")
    val out = Decontamination.flags(train, evalDocs, k = 5, minShared = 3L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(100L, 103L), s"flagged: ${out.keySet}")
    assert(out(100L) == ((1L, 6L)), s"100: ${out(100L)}")
    assert(out(103L) == ((1L, 3L)), s"103: ${out(103L)}")
  }

  test("a doc colliding with BOTH eval docs counts both matches") {
    val train = Seq((200L,
      "the quick brown fox jumps over the lazy dog today and alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val out = Decontamination.flags(train, evalDocs, 5, 3L).collect()
    assert(out.length == 1 && out.head.getLong(1) == 2L,
      s"expected n_eval_matches=2: ${out.toSeq}")
  }

  test("the eval shingle side joins by broadcast (the corpus never shuffles)") {
    val train = (0 until 200).map(i => (i.toLong + 1000,
      s"filler words number $i plus some more tokens to shingle")).toDF("doc_id", "text")
    val plan = Decontamination.flags(train, evalDocs, 5, 3L)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "eval side must broadcast")
    assert(!plan.contains("SortMergeJoin"), "corpus-side shuffle join planned")
  }
}
