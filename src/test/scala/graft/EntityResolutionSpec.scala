package graft

import graft.text.EntityResolution
import graft.text.EntityResolution._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** EntityResolution: blocking bounds candidates, field sims are exact
  * integer permille, assignment is deterministic top-1, and the
  * planted-truth catalog resolves correctly. */
class EntityResolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val leftRows = Seq(
    (1L, "acme rocket skates deluxe", "A", 10L),
    (2L, "acme rocket skates", "A", 12L),
    (3L, "zenith quantum blender", "B", 5L),
    (4L, "nimbus cloud sofa", "C", 30L)).toDF("lid", "l_name", "l_brand", "l_size")

  private val rightRows = Seq(
    (101L, "acme rocket skates deluxe", "A", 10L),  // exact dup of 1
    (102L, "acme rocket skates pro", "A", 13L),     // near 2
    (103L, "zenith quantum blender", "B", 9L),      // name-exact, size off
    (104L, "stellar iron anvil", "D", 30L)          // shares nothing but size
  ).toDF("rid", "r_name", "r_brand", "r_size")

  private def run(minScore: Long) = EntityResolution.resolve(
    leftRows, rightRows, "lid", "rid",
    blockKeys = Seq(
      (element_at(split(col("l_name"), " "), 1), element_at(split(col("r_name"), " "), 1)),
      (col("l_brand"), col("r_brand"))),
    fields = Seq(
      Field("name", "l_name", "r_name", TokenJaccardSim, 3L),
      Field("brand", "l_brand", "r_brand", ExactSim, 1L),
      Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)),
    minScore = minScore)
    .collect().map(r => r.getAs[Long]("left_id") ->
      ((r.getAs[Long]("right_id"), r.getAs[Long]("sim_name"), r.getAs[Long]("score")))).toMap

  test("exact duplicate scores full marks and wins the assignment") {
    val m = run(2000L)
    assert(m(1L)._1 == 101L)
    assert(m(1L)._2 == 1000L)               // token jaccard 1000
    assert(m(1L)._3 == 3L * 1000 + 1000 + 1000)
  }

  test("near-duplicate resolves with partial name agreement, exact integer permille") {
    val m = run(2000L)
    assert(m(2L)._1 == 101L || m(2L)._1 == 102L)
    // "acme rocket skates" vs "acme rocket skates pro": 3/4 tokens = 750
    val cand102 = EntityResolution.resolve(
      leftRows.filter(col("lid") === 2), rightRows.filter(col("rid") === 102),
      "lid", "rid",
      Seq((col("l_brand"), col("r_brand"))),
      Seq(Field("name", "l_name", "r_name", TokenJaccardSim, 1L)), 0L).collect()(0)
    assert(cand102.getAs[Long]("sim_name") == 750L)
  }

  test("blocking prunes: no shared block key means no candidate pair") {
    // left 4 ("nimbus...", brand C) shares no first token or brand with any right row
    val m = run(0L)
    assert(!m.contains(4L))
    val cand = EntityResolution.candidates(leftRows, rightRows, "lid", "rid",
      Seq((element_at(split(col("l_name"), " "), 1), element_at(split(col("r_name"), " "), 1)),
        (col("l_brand"), col("r_brand"))))
    assert(!cand.collect().map(_.getAs[Long]("left_id")).contains(4L))
  }

  test("threshold gates: raising minScore drops weak matches, assignment is deterministic") {
    val lo = run(2000L); val hi = run(4800L)
    assert(hi.keySet.subsetOf(lo.keySet))
    assert(hi.keySet == Set(1L)) // only the exact dup survives 4800
    // stability across partitioning
    val m2 = EntityResolution.resolve(
      leftRows.repartition(5), rightRows.repartition(3), "lid", "rid",
      Seq((col("l_brand"), col("r_brand"))),
      Seq(Field("name", "l_name", "r_name", TokenJaccardSim, 3L),
        Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)), 1000L)
      .collect().map(r => r.getAs[Long]("left_id") -> r.getAs[Long]("right_id")).toMap
    val m3 = EntityResolution.resolve(
      leftRows, rightRows, "lid", "rid",
      Seq((col("l_brand"), col("r_brand"))),
      Seq(Field("name", "l_name", "r_name", TokenJaccardSim, 3L),
        Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)), 1000L)
      .collect().map(r => r.getAs[Long]("left_id") -> r.getAs[Long]("right_id")).toMap
    assert(m2 == m3)
  }

  test("AbsDiff falloff arithmetic: |10-13| at tol 5 -> 1000 - 600 = 400") {
    val r = EntityResolution.resolve(
      leftRows.filter(col("lid") === 1), rightRows.filter(col("rid") === 102),
      "lid", "rid", Seq((col("l_brand"), col("r_brand"))),
      Seq(Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)), 0L).collect()(0)
    assert(r.getAs[Long]("sim_size") == 400L)
  }
}
