package graft

import graft.knn.Prototypes
import org.scalatest.funsuite.AnyFunSuite

class PrototypesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hand-computed centroids and spread, floor semantics on negative sums") {
    // label 0: (1,2) and (2,5) -> centroid (floor 1.5, floor 3.5) = (1,3)
    //   d2: (0+1) + (1+4) = 6; mean_e2 = 600/2 = 300
    // label 1: (-3,0) and (-4,1) -> sums (-7,1) -> centroid (floor -3.5, 0) = (-4,0)
    //   d2: (1+0) + (0+1) = 2; mean_e2 = 100
    val codes = Seq((0, Seq(1, 2)), (0, Seq(2, 5)), (1, Seq(-3, 0)), (1, Seq(-4, 1)))
      .toDF("label", "qvec")
    val got = Prototypes.tightness(codes, "label")
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0) == ((2L, 6L, 300L)))
    assert(got(1) == ((2L, 2L, 100L)))
  }

  test("dimension order survives the shuffle (asymmetric dims)") {
    // centroid must be (10, 0), not a permutation: d2 would differ
    val codes = Seq((7, Seq(10, 0)), (7, Seq(10, 0)), (7, Seq(10, 1))).toDF("label", "qvec")
    val got = Prototypes.tightness(codes, "label").collect().head
    // centroid (10, floor(1/3)=0): d2 = 0+0+1 = 1
    assert(got.getLong(2) == 1L)
  }

  test("prototype join-back is a broadcast — the corpus side never shuffles for it") {
    val codes = (1 to 300).map(i => (i % 5, Seq(i % 11, i % 7))).toDF("label", "qvec")
    val plan = Prototypes.tightness(codes, "label").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join-back:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus must not shuffle for the join:\n$plan")
  }
}
