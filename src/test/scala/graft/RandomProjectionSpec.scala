package graft

import graft.knn.RandomProjection
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RandomProjection: sign-matrix parity with the SQL md5 rendering,
  * hand-computed exactness, partition invariance, shuffle-free plan,
  * and the JL distance-preservation property on a seeded fixture. */
class RandomProjectionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int, d: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(d)((rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("JVM sign derivation matches the SQL md5 rendering cell-for-cell") {
    val d = 7; val dp = 5; val seed = 42L
    val sql = spark.sql(
      s"""SELECT i, j,
         |  CASE WHEN cast(conv(substring(md5(concat(cast(i as string), '|',
         |    cast(j as string), '|', '$seed')), 1, 13), 16, 10) as bigint) % 2 = 1
         |  THEN -1 ELSE 1 END AS s
         |FROM (SELECT explode(sequence(0, ${d - 1})) AS i)
         |CROSS JOIN (SELECT explode(sequence(0, ${dp - 1})) AS j)""".stripMargin)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getInt(2).toLong)).toMap
    for (i <- 0 until d; j <- 0 until dp)
      assert(RandomProjection.sign(i, j, seed) == sql((i, j)), s"cell ($i,$j)")
    // both signs occur (a degenerate all-+1 matrix means the hash broke)
    val vals = (0 until d).flatMap(i => (0 until dp).map(j => RandomProjection.sign(i, j, seed)))
    assert(vals.contains(1L) && vals.contains(-1L))
  }

  test("hand-computed projection on a 3-vector (exact integers)") {
    val seed = 7L
    val df = Seq((1L, Array(0.5f, -1.25f, 2.0f))).toDF("vec_id", "embedding")
    val out = RandomProjection.project(df, dProj = 2, seed = seed).collect()
      .map(r => (r.getInt(1), r.getLong(2))).toMap
    val q = Array(500000L, -1250000L, 2000000L)
    for (j <- 0 until 2) {
      val want = (0 until 3).map(i => q(i) * RandomProjection.sign(i, j, seed)).sum
      assert(out(j) == want, s"coord $j")
    }
  }

  test("partition invariance and wide/tidy agreement") {
    val df = fixture(64, 16, seed = 11L)
    val a = RandomProjection.project(df, 4, 42L).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val b = RandomProjection.project(df.repartition(13), 4, 42L).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(a == b)
    val wide = RandomProjection.projectVec(df, 4, 42L).collect()
      .flatMap(r => r.getSeq[Long](1).zipWithIndex.map { case (v, j) => (r.getLong(0), j) -> v })
      .toMap
    assert(wide == a)
  }

  test("ragged embedding column fails loudly, not silently truncated") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      RandomProjection.project(df, 2, 42L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged")), msgs(e).mkString(" | "))
  }

  test("plan is map-only: no Exchange anywhere") {
    val df = fixture(8, 8, seed = 3L)
    val plan = RandomProjection.projectVec(df, 4, 42L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("JL property: projected cosine tracks true cosine (seed-pinned fixture)") {
    // clustered fixture: without structure every true cosine is ≈ 0
    // and there is nothing to correlate — 8 planted directions give
    // the cosine spread (within ≈ 0.9, across ≈ 0) JL must preserve
    val d = 64; val dp = 32
    val rnd = new scala.util.Random(5L)
    val bases = Array.fill(8)(Array.fill(d)(rnd.nextGaussian()))
    val df = (0 until 40).map { i =>
      val b = bases(i % 8)
      (i.toLong, b.map(x => (x * 0.8 + rnd.nextGaussian() * 0.25).toFloat))
    }.toDF("vec_id", "embedding")
    val raw = df.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val proj = RandomProjection.projectVec(df, dp, 42L).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    val ids = raw.keys.toSeq.sorted
    val pairs = for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (cos(raw(ids(i)).map(_.toDouble), raw(ids(j)).map(_.toDouble)),
             cos(proj(ids(i)).map(_.toDouble), proj(ids(j)).map(_.toDouble)))
    val (xs, ys) = (pairs.map(_._1), pairs.map(_._2))
    val mx = xs.sum / xs.size; val my = ys.sum / ys.size
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val r = cov / math.sqrt(
      xs.map(x => (x - mx) * (x - mx)).sum * ys.map(y => (y - my) * (y - my)).sum)
    assert(r > 0.6, s"JL correlation too weak: $r")
  }
}
