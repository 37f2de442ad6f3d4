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

  test("hash-Bernoulli sampling: deterministic, rate-accurate, class-preserving") {
    import graft.util.Sampling
    val df = (1L to 10000L).map(i => (i, if (i % 100 == 0) 1 else 0)).toDF("id", "label")
    val kept = Sampling.bernoulli(df, 0.5, 42L, Seq("id"))
    val n = kept.count()
    assert(math.abs(n - 5000L) < 300, s"expected ~5000 of 10000 at keep=0.5, got $n")
    // pure function of (key, seed): same call -> identical membership
    assert(Sampling.bernoulli(df, 0.5, 42L, Seq("id")).collect().toSet == kept.collect().toSet)
    // different seed -> different membership (overwhelmingly)
    assert(Sampling.bernoulli(df, 0.5, 43L, Seq("id")).collect().toSet != kept.collect().toSet)
    // class downsample keeps EVERY positive, samples only negatives
    val ds = Sampling.downsampleClass(df, "label", 0, 0.25, 7L, Seq("id"))
    assert(ds.filter($"label" === 1).count() == 100)
    val negs = ds.filter($"label" === 0).count()
    assert(math.abs(negs - 2475L) < 250, s"expected ~2475 negatives at keep=0.25, got $negs")
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
