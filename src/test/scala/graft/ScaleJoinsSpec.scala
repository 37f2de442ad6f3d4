package graft

import graft.util.ScaleJoins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed tables join without an Exchange (co-located join)") {
    val a = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong % 50, i.toLong)).toDF("k", "vb")
    ScaleJoins.writeBucketed(a, "bkt_a", "k", 8)
    ScaleJoins.writeBucketed(b, "bkt_b", "k", 8)
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    // disable broadcast so the co-location (not a broadcast) removes the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() == a.join(b, "k").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bkt_a")
      spark.sql("DROP TABLE IF EXISTS bkt_b")
    }
  }

  test("salted join equals the plain join and spreads hot keys") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong % 100, i))
      .toDF("k", "v") // key 1 is hot
    val dim = (0L to 99L).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = big.join(dim, "k")
    val salted = ScaleJoins.saltedJoin(big, dim, "k", 4)
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k").count().collect().toSet ==
      plain.groupBy("k").count().collect().toSet)
  }
}
