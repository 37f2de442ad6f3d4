package graft

import graft.util.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Efraimidis-Spirakis A-ES weighted reservoir (verdict r11
  * item 4): kernel equality across the size gate, the w>0 contract,
  * the ∝-weight selection property, and the no-global-sort plan shape
  * of the large-n branch. */
class WeightedReservoirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(n: Int) =
    (0 until n).map(i => (i.toLong, (i % 3 + 1).toDouble)).toDF("id", "w")

  test("heap and GlobalRank kernels select the identical sample in the identical order") {
    val df = rows(1000).repartition(7)
    val heap = Sampling.weightedReservoir(df, 100, "w", Seq("id"), seed = 42L)
      .select("id", "w", "rank").collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._2)
    val rank = Sampling.weightedReservoir(df, 100, "w", Seq("id"), seed = 42L,
        heapMaxN = 1)
      .select("id", "w", "rank").collect().map(r => (r.getLong(0), r.getInt(2))).sortBy(_._2)
    assert(heap.length == 100 && heap.sameElements(rank))
  }

  test("selection probability follows the weights (3:1 weights -> ~3:1 selection)") {
    // ids 0..899: weight 1 for id%3==0 (n=300), weight 3 otherwise
    // (n=600). Expected share of weight-3 rows in a 90-row sample:
    // 1800/2100 ≈ 0.857. One seeded draw is deterministic; band wide.
    val df = (0 until 900).map(i => (i.toLong, if (i % 3 == 0) 1.0 else 3.0))
      .toDF("id", "w")
    val picked = Sampling.weightedReservoir(df, 90, "w", Seq("id"), seed = 11L)
      .select("id").as[Long].collect()
    val heavy = picked.count(_ % 3 != 0)
    assert(picked.length == 90)
    assert(heavy >= 65 && heavy <= 88, s"weight-3 rows picked: $heavy of 90 (expect ~77)")
  }

  test("a dominant weight is always selected first; w <= 0 and NULL are excluded") {
    val df = ((0 until 200).map(i => (i.toLong, 1.0)) :+ (999L, 1e9))
      .toDF("id", "w")
      .union(Seq((1000L, 0.0), (1001L, -5.0)).toDF("id", "w"))
      .union(Seq((1002L, Option.empty[Double])).toDF("id", "w"))
    val out = Sampling.weightedReservoir(df, 20, "w", Seq("id"), seed = 3L)
      .select("id", "rank").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.find(_._2 == 1).map(_._1).contains(999L),
      "the 1e9-weight row must rank first (its key is the maximum by construction)")
    assert(!out.exists(x => x._1 >= 1000L && x._1 <= 1002L), "non-positive/null weights leaked")
  }

  test("n larger than the corpus returns every positive-weight row") {
    val df = rows(40)
    assert(Sampling.weightedReservoir(df, 1000, "w", Seq("id"), 1L).count() == 40)
    assert(Sampling.weightedReservoir(df, 1000, "w", Seq("id"), 1L, heapMaxN = 1).count() == 40)
  }

  test("stratified variant: exactly n per stratum, ranks 1..n, independent reservoirs") {
    val df = (0 until 600).map(i => (i.toLong, (i % 4).toString, (i % 5 + 1).toDouble))
      .toDF("id", "g", "w")
    val out = Sampling.weightedReservoirByGroup(df, 25, "w", Seq("g"), Seq("id"), 9L)
      .select("g", "id", "rank").collect()
    val byG = out.groupBy(_.getString(0))
    assert(byG.keySet == Set("0", "1", "2", "3"))
    byG.values.foreach { g =>
      assert(g.length == 25)
      assert(g.map(_.getInt(2)).sorted.sameElements(1 to 25))
    }
  }

  test("stratified variant drops NULL-key rows even when the stratum is short") {
    // stratum "a" has 2 positive-weight rows with non-null keys and one
    // NULL-key row; n=3 must NOT backfill with the NULL-keyed row
    // (hashKeep NULL contract, same as the global reservoir)
    val df = Seq((Some(1L), "a", 2.0), (Some(2L), "a", 1.0), (None, "a", 5.0),
      (Some(3L), "b", 1.0)).toDF("id", "g", "w")
    val out = Sampling.weightedReservoirByGroup(df, 3, "w", Seq("g"), Seq("id"), 7L)
      .collect()
    assert(out.forall(!_.isNullAt(0)), "NULL-key row entered a short stratum")
    assert(out.count(_.getString(1) == "a") == 2)
    assert(out.count(_.getString(1) == "b") == 1)
  }

  test("large-n branch plans no empty-partition window over corpus rows") {
    import org.apache.spark.sql.execution.window.WindowExec
    val df = rows(500)
    val out = Sampling.weightedReservoir(df, 200, "w", Seq("id"), 42L, heapMaxN = 1)
    val wins = out.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val cols = w.child.output.map(_.name)
      assert(!cols.contains("id") && !cols.contains("w"),
        s"global window over corpus rows: $cols")
    }
    assert(wins.exists(_.partitionSpec.nonEmpty))
  }
}
