package graft

import graft.knn.SemDeDup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDeDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic float vectors with planted structure: base vectors
    * per "topic", plus exact duplicates and scaled copies (cosine 1.0
    * with their source) and orthogonal one-hot outliers. */
  private def planted() = {
    val rnd = new scala.util.Random(7)
    val dim = 16
    val topics = Array.fill(4)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val base = (0 until 40).map { i =>
      val t = topics(i % 4)
      // noise sized so same-topic cosine ~ 0.86 — below the 0.99 dup
      // threshold but high enough to co-cluster
      val noise = Array.fill(dim)((rnd.nextGaussian() * 0.4).toFloat)
      (i.toLong, t.zip(noise).map { case (a, b) => a + b })
    }
    // 100: exact copy of 0; 101: 0 scaled by 2 (cosine 1 either way)
    val v0 = base.head._2
    (base :+ ((100L, v0.clone())) :+ ((101L, v0.map(_ * 2f))))
      .toDF("vec_id", "embedding")
  }

  test("cluster: deterministic, ties to smallest index, k=1 degenerate") {
    val df = planted()
    val codes = graft.knn.Quantize.int8(df, "embedding").select($"vec_id", $"qvec")
    val one = SemDeDup.cluster(codes, "vec_id", k = 1, iters = 2)
    assert(one.select("cluster").distinct().collect().map(_.getInt(0)).toSeq == Seq(0))
    val a = SemDeDup.cluster(codes, "vec_id", k = 4, iters = 3)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = SemDeDup.cluster(codes, "vec_id", k = 4, iters = 3)
      .select("vec_id", "cluster").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "same input, same params -> same assignment")
    assert(a.values.toSet.subsetOf((0 until 4).toSet))
  }

  test("semDedup: planted exact/scaled copies flagged, anchor kept") {
    val out = SemDeDup.semDedup(planted(), "vec_id", "embedding",
      k = 4, iters = 3, tau2PerTenK = 9801L) // tau = 0.99
    val m = out.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    // the copies of vec 0 are semantic duplicates; vec 0 itself (the
    // smallest id of the group) is the kept anchor
    assert(m(100L) == 1, "exact copy flagged")
    assert(m(101L) == 1, "scaled copy flagged (cosine is scale-invariant)")
    assert(m(0L) == 0, "smallest-id anchor kept")
    // with tau=0.99 the noisy same-topic vectors are NOT duplicates
    assert(m.count { case (id, d) => id < 100 && d == 1 } == 0)
  }

  test("semDedup: dup scope is the cluster — a pair split across clusters is not flagged") {
    // two exact-duplicate pairs engineered into different clusters by
    // making them the k-means seeds (ids 0 and 1 seed clusters 0 and 1)
    val dim = 8
    val va = Array.fill(dim)(1f); val vb = Array.tabulate(dim)(i => if (i < 4) 1f else -1f)
    val df = Seq(
      (0L, va), (1L, vb),
      (2L, va.map(_ * 3f)), // same direction as 0 -> same cluster, dup
      (3L, vb.map(_ * 3f))  // same direction as 1 -> same cluster, dup
    ).toDF("vec_id", "embedding")
    val out = SemDeDup.semDedup(df, "vec_id", "embedding",
      k = 2, iters = 1, tau2PerTenK = 9801L)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId(2L)._3 == 1 && byId(3L)._3 == 1)
    assert(byId(0L)._3 == 0 && byId(1L)._3 == 0)
    // 0/2 share a cluster, 1/3 share the other
    assert(byId(0L)._2 == byId(2L)._2 && byId(1L)._2 == byId(3L)._2)
    assert(byId(0L)._2 != byId(1L)._2)
  }

  test("threshold monotonicity: higher tau flags a subset") {
    val df = planted()
    def flagged(tau2: Long) =
      SemDeDup.semDedup(df, "vec_id", "embedding", k = 2, iters = 2, tau2PerTenK = tau2)
        .filter($"is_semdup" === 1).select("vec_id").collect().map(_.getLong(0)).toSet
    val loose = flagged(2500L)  // tau = 0.5
    val tight = flagged(9801L)  // tau = 0.99
    assert(tight.subsetOf(loose))
    assert(tight.nonEmpty)
  }

  test("assignment is narrow: centroids arrive as a single broadcast row, never a shuffle") {
    val df = planted()
    val codes = graft.knn.Quantize.int8(df, "embedding").select($"vec_id", $"qvec")
    val plan = SemDeDup.cluster(codes, "vec_id", k = 4, iters = 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin") &&
      !plan.contains("CartesianProduct"),
      s"assignment must ride a one-row broadcast (IVF idiom), not a shuffle join:\n$plan")
    assert(plan.contains("Broadcast"), s"expected the centroid broadcast:\n$plan")
  }
}
