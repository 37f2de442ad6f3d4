package graft

import graft.util.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** keySkew: exact figures vs a driver-side recount, partition
  * invariance, and the salt recommendation's ceiling semantics. */
class KeySkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def skew(rows: Seq[String], parts: Int, sp: Int) = {
    val r = Profile.keySkew(rows.toDF("k").repartition(parts), Seq("k"), sp)
      .collect()(0)
    (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"),
      r.getAs[Long]("max_key_rows"), r.getAs[Long]("p99_key_rows"),
      r.getAs[Long]("avg_key_rows"), r.getAs[Long]("skew_ratio_permille"),
      r.getAs[Long]("suggested_salt"))
  }

  test("exact figures on a known skewed distribution") {
    // hot: 60 rows, others: 10 x 4 keys = 40 rows; n=100, keys=5
    val rows = Seq.fill(60)("hot") ++ Seq("a", "b", "c", "d").flatMap(k => Seq.fill(10)(k))
    val (n, k, mx, p99, avg, ratio, salt) = skew(rows, 5, 10)
    assert(n == 100 && k == 5 && mx == 60)
    assert(p99 == 60)   // ceil(0.99*5)=5 -> the max count
    assert(avg == 20)
    assert(ratio == (1000L * 60 * 10) / 100) // 6000 permille
    assert(salt == 6)   // ceil(10*60/100) = 6
  }

  test("ceiling semantics of suggested_salt (non-exact division rounds UP)") {
    // max=7 of n=13, sp=3: 3*7/13 = 1.615 -> salt 2
    val rows = Seq.fill(7)("x") ++ Seq.fill(6)("y")
    val (_, _, _, _, _, _, salt) = skew(rows, 3, 3)
    assert(salt == 2)
  }

  test("uniform keys with enough key cardinality suggest salt 1; partition-invariant") {
    // 9 uniform keys at sp=3: ceil(3*10/90) = 1 — no salting needed.
    // (At sp=32 the same data needs salt 4: cardinality, not skew,
    // is the limit — the formula covers both.)
    val rows = (1 to 90).map(i => s"k${i % 9}")
    val a = skew(rows, 1, 3)
    val b = skew(rows, 13, 3)
    assert(a == b)
    assert(a._7 == 1L)
    assert(a._3 == 10L && a._5 == 10L)
    assert(skew(rows, 1, 32)._7 == 4L)
  }

  test("p99 lands below the hot key on a long-tailed distribution") {
    // 200 keys: 199 keys with 1 row, one key with 1000 rows
    val rows = (1 to 199).map(i => s"t$i") ++ Seq.fill(1000)("hot")
    val (_, k, mx, p99, _, _, _) = skew(rows, 8, 32)
    assert(k == 200 && mx == 1000)
    assert(p99 == 1L) // rank ceil(0.99*200)=198 of ascending counts is still 1
  }
}
