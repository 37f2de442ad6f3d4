package graft

import graft.knn.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pca: exact integer Gram moments (hand-computed, partition-invariant,
  * null-listwise), Jacobi eigensolver on a known matrix, fit recovering
  * a planted dominant direction with the pinned sign convention, and a
  * map-only transform plan. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture(n: Int, d: Int, seed: Long) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      (i.toLong, Array.fill(d)((rnd.nextGaussian() * 0.3).toFloat))
    }.toDF("vec_id", "embedding")
  }

  test("gram moments match a hand computation (exact integers)") {
    val df = Seq(
      (1L, Array(0.5f, -1.25f)),
      (2L, Array(2.0f, 0.001f)),
      (3L, Array(-0.0005f, 3.0f))).toDF("vec_id", "embedding")
    // milli-quantized, half away from zero: rows (500,-1250),(2000,1),(-1,3000)
    val q = Seq(Seq(500L, -1250L), Seq(2000L, 1L), Seq(-1L, 3000L))
    val out = Pca.gram(df).collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 3) // d=2 -> 3 unordered pairs
    for (i <- 0 until 2; j <- i until 2) {
      val si = q.map(_(i)).sum; val sj = q.map(_(j)).sum
      val g = q.map(r => r(i) * r(j)).sum
      assert(out((i, j)) == ((3L, si, sj, g)), s"pair ($i,$j)")
    }
  }

  test("gram is partition-invariant and drops null embeddings listwise") {
    val base = fixture(120, 6, seed = 5L)
    val withNulls = base.union(
      Seq((900L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val a = Pca.gram(base).collect().map(_.toString).sorted
    val b = Pca.gram(withNulls.repartition(17)).collect().map(_.toString).sorted
    assert(a.sameElements(b))
    assert(a.length == 6 * 7 / 2)
  }

  test("ragged embedding column fails loudly") {
    val df = Seq((1L, Array(1.0f, 2.0f, 3.0f)), (2L, Array(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception] { Pca.gram(df).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ragged")), msgs(e).mkString(" | "))
  }

  test("jacobiEigen recovers a known 3x3 spectrum") {
    // A = Q diag(6,3,1) Q^T with Q a hand rotation; use a simple
    // symmetric matrix whose spectrum is known analytically:
    // [[2,1,0],[1,2,0],[0,0,5]] has eigenvalues 5, 3, 1
    val a = Array(
      Array(2.0, 1.0, 0.0),
      Array(1.0, 2.0, 0.0),
      Array(0.0, 0.0, 5.0))
    val (evals, evecs) = Pca.jacobiEigen(a)
    assert(evals.sorted.zip(Seq(1.0, 3.0, 5.0)).forall { case (x, y) => math.abs(x - y) < 1e-9 })
    // eigenvector columns are orthonormal
    val d = 3
    for (p <- 0 until d; r <- p until d) {
      val dot = (0 until d).map(i => evecs(i)(p) * evecs(i)(r)).sum
      val want = if (p == r) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"col dot ($p,$r)")
    }
  }

  test("fit recovers a planted dominant direction (deterministic sign)") {
    // points on the line t * (3,4)/5 plus tiny orthogonal jitter:
    // first component must be ~(0.6, 0.8) with the pinned positive sign
    val rnd = new scala.util.Random(3L)
    val df = (0 until 400).map { i =>
      val t = rnd.nextGaussian() * 2.0
      val o = rnd.nextGaussian() * 0.01
      (i.toLong, Array((0.6 * t - 0.8 * o).toFloat, (0.8 * t + 0.6 * o).toFloat))
    }.toDF("vec_id", "embedding")
    val m = Pca.fit(df, k = 2)
    assert(m.d == 2 && m.k == 2 && m.n == 400)
    assert(m.eigenvalues(0) > m.eigenvalues(1) * 100)
    assert(math.abs(m.components(0)(0) - 0.6) < 0.02, m.components(0).mkString(","))
    assert(math.abs(m.components(0)(1) - 0.8) < 0.02)
    // sign convention: largest-|component| entry positive
    m.components.foreach { v =>
      val pivot = v.indices.maxBy(i => (math.abs(v(i)), -i))
      assert(v(pivot) > 0)
    }
  }

  test("transform matches driver-side centered projection; plan is map-only") {
    val df = fixture(50, 4, seed = 9L)
    val m = Pca.fit(df, k = 2)
    val out = Pca.transform(df, m).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rows = df.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    rows.foreach { case (id, emb) =>
      val q = emb.map(x => math.round(x.toDouble * Pca.QuantScale).toDouble)
      val want = m.components.map(w =>
        (0 until m.d).map(i => (q(i) - m.mean(i)) * w(i)).sum)
      out(id).zip(want).foreach { case (got, exp) =>
        assert(math.abs(got - exp) < 1e-6 * math.max(1.0, math.abs(exp)))
      }
    }
    val plan = Pca.transform(df, m).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
