package graft

import graft.knn.Dbscan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dbscan: hand-labeled fixture (core/border/noise, min-id clusters),
  * cross-cell neighbor discovery, partition invariance, and full
  * agreement with a brute-force O(n²) reference on a seeded cloud. */
class DbscanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference: classic DBSCAN with the pinned labeling
    * (clusters = CC of core eps-adjacency by min id; border joins the
    * smallest core-neighbor cluster). */
  private def reference(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int)
      : Map[Long, (String, Long)] = {
    def close(a: (Long, Long, Long), b: (Long, Long, Long)): Boolean = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps * eps
    }
    val nb = pts.map(p => p._1 -> pts.filter(q => close(p, q)).map(_._1)).toMap
    val core = pts.map(_._1).filter(id => nb(id).size >= minPts).toSet
    // union-find over core-core edges
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for (c <- core; d <- nb(c) if core(d)) {
      val (rc, rd) = (find(c), find(d))
      if (rc != rd) parent(math.max(rc, rd)) = math.min(rc, rd)
    }
    val label = core.map(c => c -> core.filter(d => find(d) == find(c)).min).toMap
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> ("core", label(id))
      else {
        val coreNb = nb(id).filter(core)
        if (coreNb.nonEmpty) id -> ("border", coreNb.map(label).min)
        else id -> ("noise", -1L)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int) =
    Dbscan.cluster(pts.toDF("vec_id", "px", "py"), Seq("px", "py"), eps, minPts)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap

  test("hand fixture: two clusters, a border point, noise") {
    // cluster A around origin (4 tight points), cluster B at (100,100),
    // border point 10 within eps of A's cores only, noise point far away
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (20L, 100L, 100L), (21L, 101L, 100L), (22L, 100L, 101L), (23L, 101L, 101L),
      (10L, 4L, 0L), // only (1,0) within eps=3: 2 nbrs incl self < minPts -> border
      (99L, 50L, 50L))
    val got = run(pts, eps = 3L, minPts = 4)
    val want = reference(pts, eps = 3L, minPts = 4)
    assert(got == want)
    assert(got(1L) == (("core", 1L)) && got(20L) == (("core", 20L)))
    assert(got(10L)._1 == "border" && got(10L)._2 == 1L)
    assert(got(99L) == (("noise", -1L)))
  }

  test("neighbors across a cell boundary are found (negative coords too)") {
    // eps=10: cells [-10,0) and [0,10) — the pair straddles the boundary
    val pts = Seq((1L, -1L, 0L), (2L, 1L, 0L), (3L, -9L, 0L))
    val got = run(pts, eps = 10L, minPts = 2)
    // all three pairwise within 10 except (2,3) at distance 10 exactly -> included
    assert(got.values.forall(_._1 == "core"))
    assert(got.values.map(_._2).toSet == Set(1L))
  }

  test("minPts=1: isolated points are singleton core clusters") {
    val pts = Seq((5L, 0L, 0L), (6L, 1000L, 1000L))
    val got = run(pts, eps = 3L, minPts = 1)
    assert(got == Map(5L -> (("core", 5L)), 6L -> (("core", 6L))))
  }

  test("border tie goes to the SMALLEST core cluster id") {
    // two tight 4-point clusters; point 50 midway is border to BOTH
    // (3 nbrs incl self < minPts=4), with one core neighbor in each
    val pts = Seq(
      (1L, 0L, 0L), (2L, 1L, 0L), (3L, 0L, 1L), (4L, 1L, 1L),
      (7L, 9L, 0L), (8L, 10L, 0L), (9L, 9L, 1L), (11L, 10L, 1L),
      (50L, 5L, 0L)) // d=4 to core 2 (cluster 1) and core 7 (cluster 7)
    val got = run(pts, eps = 4L, minPts = 4)
    val want = reference(pts, eps = 4L, minPts = 4)
    assert(got == want)
    assert(got(50L) == (("border", 1L)))
  }

  test("seeded 300-point cloud matches brute force exactly; partition-invariant") {
    val rnd = new scala.util.Random(17L)
    // three gaussian blobs + uniform background noise
    val blobs = Seq((0L, 0L), (500L, 0L), (0L, 500L))
    val pts = (0 until 240).map { i =>
      val (cx, cy) = blobs(i % 3)
      (i.toLong, cx + math.round(rnd.nextGaussian() * 40),
        cy + math.round(rnd.nextGaussian() * 40))
    } ++ (240 until 300).map { i =>
      (i.toLong, rnd.nextInt(2000).toLong - 500L, rnd.nextInt(2000).toLong - 500L)
    }
    val got = run(pts, eps = 60L, minPts = 6)
    val want = reference(pts, eps = 60L, minPts = 6)
    assert(got == want)
    val roles = got.values.groupBy(_._1).map { case (k, v) => k -> v.size }
    assert(roles.getOrElse("core", 0) > 0 && roles.getOrElse("noise", 0) > 0)
    // partition invariance
    val df = pts.toDF("vec_id", "px", "py").repartition(13)
    val again = Dbscan.cluster(df, Seq("px", "py"), 60L, 6)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(again == got)
  }
}
