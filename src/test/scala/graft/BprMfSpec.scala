package graft

import graft.model.BprMf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BprMfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Two disjoint taste clusters: users 0-4 interact with items 0-4,
    * users 5-9 with items 5-9 — after training, a user's held-out
    * in-cluster item must outscore every out-cluster item. */
  private def clusterPositives = (for {
    u <- 0 until 10
    i <- 0 until 5
    item = if (u < 5) i else 5 + i
    if !(u % 5 == i) // hold out one in-cluster item per user
  } yield (u, item)).toDF("u", "i")

  private def dot(p: Array[Float], q: Array[Float], d: Int): Double = {
    var s = q(d).toDouble; var k = 0
    while (k < d) { s += p(k) * q(k); k += 1 }
    s
  }

  test("BPR learns the cluster structure: held-out positives beat out-cluster items") {
    val d = 8
    val m = new BprMf(d, 60, 0.5, 0.001, 42L)
    val (p, q) = m.fit(spark, clusterPositives, 10, 10)
    var heldWins = 0; var comparisons = 0
    for (u <- 0 until 10) {
      val held = if (u < 5) u % 5 else 5 + u % 5
      val out = if (u < 5) 5 until 10 else 0 until 5
      val sh = dot(p(u), q(held), d)
      out.foreach { o => comparisons += 1; if (sh > dot(p(u), q(o), d)) heldWins += 1 }
    }
    assert(heldWins >= (comparisons * 9) / 10,
      s"held-out positives won only $heldWins/$comparisons pairwise comparisons")
  }

  test("driver and distributed tiers compute the same update (seam-pinned parity)") {
    val d = 4
    class Pinned extends BprMf(d, 2, 0.1, 0.01, 42L) {
      private def v(id: Int, slot: Int): Float = (((id * 31 + slot * 7) % 13) - 6) / 24.0f
      override protected def initArrays(nUsers: Int, nItems: Int) = (
        Array.tabulate(nUsers)(id => Array.tabulate(d)(s => v(id, s))),
        Array.tabulate(nItems)(id =>
          Array.tabulate(d + 1)(s => if (s == d) 0.0f else v(1000 + id, s))))
      override protected def initTables(spark: org.apache.spark.sql.SparkSession,
                                        nUsers: Int, nItems: Int) = {
        import org.apache.spark.sql.types._
        val (p, q) = initArrays(nUsers, nItems)
        val schema = StructType(Seq(
          StructField("id", IntegerType, nullable = false),
          StructField("vec", ArrayType(FloatType, containsNull = false))))
        def wrap(a: Array[Array[Float]]) = spark.createDataFrame(
          spark.sparkContext.parallelize(a.toIndexedSeq.zipWithIndex.map {
            case (vec, id) => org.apache.spark.sql.Row(id, vec.toIndexedSeq) }, 2),
          schema)
        (wrap(p), wrap(q))
      }
      override protected def negativeFn: (Int, Int, Int, Int) => Int =
        (u, i, epoch, nI) => math.floorMod(u * 31 + i + epoch, nI)
      override protected def negativesColumnar(data: org.apache.spark.sql.DataFrame,
                                               epoch: Int, nItems: Int) =
        data.withColumn("j",
          pmod(col("u") * 31 + col("i") + lit(epoch), lit(nItems)).cast("int"))
    }
    val pos = clusterPositives
    val (pArr, qArr) = new Pinned().fit(spark, pos, 10, 10)
    val (pDf, qDf) = new Pinned().fitDistributed(spark, pos, 10, 10)
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
    val pD = toMap(pDf); val qD = toMap(qDf)
    def close(a: Array[Float], b: Array[Float], what: String): Unit = {
      assert(a.length == b.length, s"$what width")
      a.indices.foreach(i => assert(math.abs(a(i) - b(i)) < 2e-5f,
        s"$what[$i]: driver ${a(i)} vs distributed ${b(i)}"))
    }
    // non-vacuous: at least one parameter moved off its init
    assert(pArr.exists(_.exists(x => math.abs(x) > 0.26f)) ||
      qArr.exists(q => math.abs(q(d)) > 0f), "no parameter moved")
    pArr.indices.foreach(id => close(pArr(id), pD(id), s"p[$id]"))
    qArr.indices.foreach(id => close(qArr(id), qD(id), s"q[$id]"))
  }

  test("pinOrder fits are bit-identical across repeated runs") {
    val pos = clusterPositives.repartition(7)
    val m1 = new BprMf(8, 3, 0.1, 0.01, 7L, pinOrder = true)
    val m2 = new BprMf(8, 3, 0.1, 0.01, 7L, pinOrder = true)
    val (p1, q1) = m1.fit(spark, pos, 10, 10)
    val (p2, q2) = m2.fit(spark, pos, 10, 10)
    assert(p1.zip(p2).forall { case (a, b) => a.sameElements(b) })
    assert(q1.zip(q2).forall { case (a, b) => a.sameElements(b) })
  }

  test("recs contract: ranks 1..k, no seen items, deterministic") {
    val ratings = (for { u <- 0 until 8; i <- 0 until 12 if (u + i) % 3 != 0 }
      yield (u.toLong, i.toLong, if ((u * i) % 4 == 0) 5.0 else 3.0)).toDF("user_id", "item_id", "rating")
    val out = BprMf.recs(spark, ratings, minRating = 4.0, dim = 4, epochs = 2,
      lr = 0.1, reg = 0.01, seed = 42L, k = 3, pinOrder = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val seen = ratings.filter($"rating" >= 4.0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.nonEmpty)
    out.foreach { case (u, i, rk) =>
      assert(rk >= 1 && rk <= 3)
      assert(!seen((u, i)), s"recommended seen item $i to $u")
    }
    out.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._3).sorted.sameElements(1 to rs.size)) }
  }

  test("fold-frame quality: BPR earns nonzero MAP/nDCG@5 on the ml-100k-shaped fixture") {
    // the q142 fold recipe on MlFixture's learnable structure (the
    // sf0.001 ratings projection is too sparse/unstructured for a
    // 5-epoch full-batch MF to beat chance — probed MAP 0.0 there)
    val r = MlFixture.ratings(spark, 42L)
    val folded = graft.split.EdgeSplits.kFold(r, 5, "user", Seq(col("item_id")))
    val train = folded.filter(col("fold") =!= 1).select("user_id", "item_id", "rating")
    val test = folded.filter(col("fold") === 1).select("user_id", "item_id", "rating")
    val recs = BprMf.recs(spark, train, minRating = 4.0, dim = 16, epochs = 20,
      lr = 0.5, reg = 0.005, seed = 42L, k = 5)
    val m = graft.eval.Metrics.meansAtK(
      recs.select(col("user_id"), col("item_id"), col("rank")), test, 5, 4.0)
      .collect().head
    val map = m.getDouble(0); val ndcg = m.getDouble(1)
    info(f"BPR fixture MAP@5=$map%.5f nDCG@5=$ndcg%.5f")
    assert(map > 0.005 && map <= 1.0, s"map=$map")
    assert(ndcg > 0.005 && ndcg <= 1.0, s"ndcg=$ndcg")
  }
}
