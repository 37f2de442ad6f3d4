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

  test("blockingStats: bare low-cardinality key flags quadratic, composite does not; exact arithmetic") {
    val l = (0 until 200).map(i => (i.toLong, s"name$i tail", s"B${i % 4}", (i % 10).toLong))
      .toDF("left_id", "l_name", "l_brand", "l_size")
    val r = (0 until 200).map(i => (i + 1000L, s"name$i", s"B${i % 4}", (i % 10).toLong))
      .toDF("right_id", "r_name", "r_brand", "r_size")
    val keys = Seq(
      (compositeKey(element_at(split(col("l_name"), " "), 1), col("l_brand")),
        compositeKey(element_at(split(col("r_name"), " "), 1), col("r_brand"))),
      (col("l_brand"): org.apache.spark.sql.Column,
        col("r_brand"): org.apache.spark.sql.Column))
    val truth = (0 until 200).map(i => (i.toLong, i + 1000L)).toDF("left_id", "right_id")
    val st = EntityResolution.blockingStats(l, r, "left_id", "right_id", keys, Some(truth))
      .collect().map(row => row.getLong(0) -> row).toMap
    // key 0 (unique first token + brand): 200 singleton blocks,
    // cand = 200, reduction = 1000 - 200*1000/40000 = 995, no flag,
    // full completeness
    val k0 = st(0L)
    assert(k0.getAs[Long]("n_blocks") == 200L)
    assert(k0.getAs[Long]("cand_pairs") == 200L)
    assert(k0.getAs[Long]("max_block_pairs") == 1L)
    assert(k0.getAs[Long]("reduction_permille") == 995L)
    assert(k0.getAs[Long]("quadratic_flag") == 0L)
    assert(k0.getAs[Long]("pc_permille") == 1000L)
    // key 1 (bare 4-value brand — the r13 q200 incident shape):
    // 4 blocks of 50x50 = 10000 cand > 16*(200+200) -> flagged
    val k1 = st(1L)
    assert(k1.getAs[Long]("n_blocks") == 4L)
    assert(k1.getAs[Long]("cand_pairs") == 10000L)
    assert(k1.getAs[Long]("max_block_pairs") == 2500L)
    assert(k1.getAs[Long]("reduction_permille") == 750L)
    assert(k1.getAs[Long]("quadratic_flag") == 1L)
    assert(k1.getAs[Long]("pc_permille") == 1000L)
  }

  test("blockingStats: NULL keys never count; missed truth shows in pc_permille; adviseBlocking preserves output") {
    val l = Seq((1L, "aa", "X"), (2L, "bb", null), (3L, "cc", "Y"))
      .toDF("left_id", "l_name", "l_brand")
    val r = Seq((11L, "aa", "X"), (12L, "bb", null), (13L, "cc", "Z"))
      .toDF("right_id", "r_name", "r_brand")
    val truth = Seq((1L, 11L), (2L, 12L), (3L, 13L)).toDF("left_id", "right_id")
    val st = EntityResolution.blockingStats(l, r, "left_id", "right_id",
      Seq((col("l_brand"), col("r_brand"))), Some(truth)).collect()(0)
    // only block X co-present (NULLs never pair; Y/Z not shared):
    // 1 block, 1 cand pair; truth covered = 1 of 3 -> 333 permille
    assert(st.getAs[Long]("n_blocks") == 1L)
    assert(st.getAs[Long]("cand_pairs") == 1L)
    assert(st.getAs[Long]("truth_covered") == 1L)
    assert(st.getAs[Long]("pc_permille") == 333L)
    // the resolve-side advisory is a warning only: output identical
    val fields = Seq(Field("name", "l_name", "r_name", TokenJaccardSim, 1L))
    val base = EntityResolution.resolve(l, r, "left_id", "right_id",
      Seq((col("l_brand"), col("r_brand"))), fields, 0L)
      .collect().map(_.toString).sorted
    val advised = EntityResolution.resolve(l, r, "left_id", "right_id",
      Seq((col("l_brand"), col("r_brand"))), fields, 0L, adviseBlocking = true)
      .collect().map(_.toString).sorted
    assert(advised.sameElements(base))
  }

  test("AbsDiff falloff arithmetic: |10-13| at tol 5 -> 1000 - 600 = 400") {
    val r = EntityResolution.resolve(
      leftRows.filter(col("lid") === 1), rightRows.filter(col("rid") === 102),
      "lid", "rid", Seq((col("l_brand"), col("r_brand"))),
      Seq(Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)), 0L).collect()(0)
    assert(r.getAs[Long]("sim_size") == 400L)
  }
}
