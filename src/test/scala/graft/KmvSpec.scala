package graft

import graft.util.Kmv
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch invariants: order/partition invariance (mergeability),
  * small-set exactness, threshold coordination of the union synopsis,
  * and set-op estimates within sketch tolerance of exact answers. */
class KmvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sketch is partition- and duplication-invariant") {
    val ids = (1 to 5000).map(i => i.toLong * 7919L)
    val a = ids.toDF("id")
    val b = (ids ++ ids ++ ids).reverse.toDF("id").repartition(17)
    val sa = Kmv.sketch(a, Seq("id"), k = 128, seed = 7L).collect()(0).getSeq[Long](0)
    val sb = Kmv.sketch(b, Seq("id"), k = 128, seed = 7L).collect()(0).getSeq[Long](0)
    assert(sa == sb)
    assert(sa.length == 128)
    assert(sa == sa.sorted)
    assert(sa.distinct.length == sa.length)
  }

  test("below-k sketch holds every distinct hash and estimates exactly") {
    val df = (1 to 40).map(_.toLong).toDF("id")
    val ops = Kmv.setOps(df, df, Seq("id"), k = 256, seed = 1L).collect()(0)
    assert(ops.getAs[Long]("n_a") == 40)
    assert(ops.getAs[Long]("est_a_e6") == 40L * 1000000L)
    assert(ops.getAs[Long]("k_inter") == 40)
    assert(ops.getAs[Long]("est_inter_e6") == 40L * 1000000L)
    assert(ops.getAs[Long]("k_diff") == 0)
    assert(ops.getAs[Long]("est_diff_e6") == 0L)
  }

  test("set-op estimates land within sketch tolerance of exact") {
    // A = 1..20000, B = 10001..30000: |A|=|B|=20k, |A∩B|=10k, |A\B|=10k
    val a = (1 to 20000).map(_.toLong).toDF("id")
    val b = (10001 to 30000).map(_.toLong).toDF("id")
    val k = 1024
    val ops = Kmv.setOps(a, b, Seq("id"), k, seed = 42L).collect()(0)
    def est(n: String) = ops.getAs[Long](n).toDouble / 1e6
    // standard error ~ D/sqrt(k-1) ≈ 3.1%; assert 4 sigma
    assert(math.abs(est("est_a_e6") - 20000) / 20000 < 0.13, est("est_a_e6"))
    assert(math.abs(est("est_b_e6") - 20000) / 20000 < 0.13, est("est_b_e6"))
    assert(math.abs(est("est_union_e6") - 30000) / 30000 < 0.13, est("est_union_e6"))
    assert(math.abs(est("est_inter_e6") - 10000) / 10000 < 0.25, est("est_inter_e6"))
    assert(math.abs(est("est_diff_e6") - 10000) / 10000 < 0.25, est("est_diff_e6"))
    // identity: inter + diff counts partition the A-portion of the union synopsis
    assert(ops.getAs[Long]("k_inter") + ops.getAs[Long]("k_diff") <= ops.getAs[Long]("n_u"))
  }

  test("union synopsis threshold is <= both sides' thresholds (membership validity)") {
    val a = (1 to 8000).map(i => i.toLong * 3L).toDF("id")
    val b = (1 to 8000).map(i => i.toLong * 5L).toDF("id")
    val k = 256
    val sa = Kmv.sketch(a, Seq("id"), k, 9L).collect()(0).getSeq[Long](0)
    val sb = Kmv.sketch(b, Seq("id"), k, 9L).collect()(0).getSeq[Long](0)
    val su = (sa ++ sb).distinct.sorted.take(k)
    assert(su.last <= sa.last && su.last <= sb.last)
  }

  test("grouped sketches equal independent per-group sketches; exact below k") {
    val rows = (1 to 3000).map(i => (s"g${i % 3}", (i * 7919L) % 500))
    val df = rows.toDF("g", "v").repartition(9)
    val grouped = Kmv.sketchGrouped(df, Seq("g"), Seq("v"), k = 64, seed = 5L)
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    for (g <- Seq("g0", "g1", "g2")) {
      val solo = Kmv.sketch(df.filter(col("g") === g).select("v"), Seq("v"), 64, 5L)
        .collect()(0).getSeq[Long](0)
      assert(grouped(g) == solo, g)
    }
    // exact branch: distinct v per group < k=512
    val est = Kmv.estimateGrouped(df, Seq("g"), Seq("v"), k = 512, seed = 5L)
      .collect().map(r => r.getString(0) -> ((r.getAs[Long]("n_kept"), r.getAs[Long]("est_e6")))).toMap
    val exact = rows.groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    for (g <- exact.keys) {
      assert(est(g)._1 == exact(g))
      assert(est(g)._2 == exact(g) * 1000000L)
    }
  }

  test("disjoint sets: zero intersection count, difference ~= |A|") {
    val a = (1 to 15000).map(_.toLong).toDF("id")
    val b = (100001 to 115000).map(_.toLong).toDF("id")
    val ops = Kmv.setOps(a, b, Seq("id"), k = 512, seed = 3L).collect()(0)
    assert(ops.getAs[Long]("k_inter") == 0)
    assert(ops.getAs[Long]("est_inter_e6") == 0)
    val diff = ops.getAs[Long]("est_diff_e6").toDouble / 1e6
    assert(math.abs(diff - 15000) / 15000 < 0.2, diff)
  }

  test("incremental KMV state: refresh == from-scratch, merge-order-invariant (q205)") {
    import graft.util.IncrementalAgg
    val rows = (0 until 900).map { i =>
      (s"g${i % 3}", (i % 97).toLong, (i % 41).toLong) // (group, value, key)
    }.toDF("g", "v", "key")
    val parts = Seq(rows.filter(col("v") < 30), rows.filter(col("v") >= 30 && col("v") < 60),
      rows.filter(col("v") >= 60))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("g").collect().map(_.toString).toSeq
    val scratch = IncrementalAgg.stateWithKmv(rows, Seq("g"), "v", "key", 8, 7L)
    // base + two refreshes
    val r1 = IncrementalAgg.refreshWithKmv(
      IncrementalAgg.refreshWithKmv(
        IncrementalAgg.stateWithKmv(parts(0), Seq("g"), "v", "key", 8, 7L),
        parts(1), Seq("g"), "v", "key", 8, 7L),
      parts(2), Seq("g"), "v", "key", 8, 7L)
    assert(canon(r1) == canon(scratch))
    // merge order cannot matter
    val r2 = IncrementalAgg.mergeWithKmv(
      Seq(parts(2), parts(0), parts(1))
        .map(p => IncrementalAgg.stateWithKmv(p, Seq("g"), "v", "key", 8, 7L)),
      Seq("g"), 8)
    assert(canon(r2) == canon(scratch))
  }

  test("kmvChurn: exact new/lost on below-k synopses; one-sided groups churn against empty") {
    import graft.util.IncrementalAgg
    // group g: keys {1..6} before, {4..9} after -> 3 new, 3 lost
    // group only_a: {1,2} before, absent after -> 0 new, 2 lost
    // group only_b: absent before, {5} after -> 1 new, 0 lost
    val a = (Seq.tabulate(6)(i => ("g", 0L, (i + 1).toLong)) ++
      Seq(("only_a", 0L, 1L), ("only_a", 0L, 2L))).toDF("g", "v", "key")
    val b = (Seq.tabulate(6)(i => ("g", 0L, (i + 4).toLong)) ++
      Seq(("only_b", 0L, 5L))).toDF("g", "v", "key")
    val ch = IncrementalAgg.kmvChurn(
      IncrementalAgg.stateWithKmv(a, Seq("g"), "v", "key", 64, 7L),
      IncrementalAgg.stateWithKmv(b, Seq("g"), "v", "key", 64, 7L),
      Seq("g"), 64)
      .collect().map(r => r.getString(0) -> r).toMap
    // below k the synopsis IS the set: ratios over the full union are
    // exact and est = count * 1e6
    val g = ch("g")
    assert(g.getAs[Long]("k_new") == 3L && g.getAs[Long]("est_new_e6") == 3000000L)
    assert(g.getAs[Long]("k_lost") == 3L && g.getAs[Long]("est_lost_e6") == 3000000L)
    val oa = ch("only_a")
    assert(oa.getAs[Long]("k_new") == 0L && oa.getAs[Long]("k_lost") == 2L)
    assert(oa.getAs[Long]("est_lost_e6") == 2000000L && oa.getAs[Long]("k_h2") == 0L)
    val ob = ch("only_b")
    assert(ob.getAs[Long]("k_new") == 1L && ob.getAs[Long]("k_lost") == 0L)
    assert(ob.getAs[Long]("est_new_e6") == 1000000L && ob.getAs[Long]("k_h1") == 0L)
  }
}
