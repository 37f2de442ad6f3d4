package graft

import graft.stream.Cohorts
import graft.text.InvertedIndex
import org.scalatest.funsuite.AnyFunSuite

class IndexAndCohortSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def index(docs: Seq[(Long, String)], shardSize: Long = 1000000L): Map[(String, Long), (Long, String)] =
    InvertedIndex.build(docs.toDF("doc_id", "text"), "doc_id", "text", shardSize)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getString(3))))
      .toMap

  test("postings carry tf and ascend by doc id") {
    val m = index(Seq(2L -> "b", 1L -> "a b a"))
    assert(m == Map(
      ("a", 0L) -> ((1L, "1:2")),
      ("b", 0L) -> ((2L, "1:1,2:1"))))
  }

  test("sharding splits a term's postings and bounds row size") {
    val m = index(Seq(0L -> "x", 63L -> "x", 64L -> "x"), shardSize = 64)
    assert(m == Map(
      ("x", 0L) -> ((2L, "0:1,63:1")),
      ("x", 1L) -> ((1L, "64:1"))))
  }

  test("case folds and empty tokens drop") {
    val m = index(Seq(1L -> "A  a"))
    assert(m == Map(("a", 0L) -> ((1L, "1:2"))))
  }

  test("shardSize must be positive") {
    intercept[IllegalArgumentException] {
      InvertedIndex.build(Seq(1L -> "a").toDF("doc_id", "text"), "doc_id", "text", 0)
    }
  }

  private val W = 7L * 86400000L

  private def retention(evs: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    Cohorts.retention(evs.toDF("user_id", "ts_ms"), "user_id", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("cohort = first week; offsets count active later weeks") {
    // user 1 active weeks {0,1,3}, user 2 active week {1}
    val m = retention(Seq((1L, 0L), (1L, W + 5L), (1L, 3 * W), (2L, W)))
    assert(m == Map((0L, 0L) -> 1L, (0L, 1L) -> 1L, (0L, 3L) -> 1L, (1L, 0L) -> 1L))
  }

  test("multiple events in one week count once") {
    val m = retention(Seq((1L, 0L), (1L, 1L), (1L, 2L)))
    assert(m == Map((0L, 0L) -> 1L))
  }

  test("same cohort and offset aggregates across users") {
    val m = retention(Seq((1L, 0L), (1L, W), (2L, 5L), (2L, W + 1L)))
    assert(m == Map((0L, 0L) -> 2L, (0L, 1L) -> 2L))
  }
}
