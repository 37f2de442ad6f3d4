package graft

import graft.model.BiasedBaseline
import org.scalatest.funsuite.AnyFunSuite

class BiasedBaselineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Long, Double)*) =
    rows.toDF("user_id", "item_id", "rating")

  test("hand-computed biases, clamping, cold-start fallbacks (λ = 0)") {
    // train: µ = 4; bu(1) = −1, bu(2) = +1; bi(A) = +1, bi(B) = −1
    val train = df((1L, 10L, 5.0), (1L, 20L, 1.0), (2L, 10L, 5.0), (2L, 20L, 5.0))
    val test = df(
      (1L, 30L, 3.0), // unseen item: p = 4 − 1 + 0 = 3 -> err 0
      (2L, 10L, 5.0), // p = 4 + 1 + 1 = 6 -> clamped to 5 -> err 0
      (2L, 20L, 5.0), // p = 4 + 1 − 1 = 4 -> err 1 star
      (3L, 10L, 1.0)) // unseen user: p = 4 + 0 + 1 = 5 -> err 4 stars
    val out = BiasedBaseline.mseByUser(train, test, 0L, 0L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out == Map(
      1L -> ((1L, 0L)),
      2L -> ((2L, 500000000000L)), // (0 + 1e12) div 2
      3L -> ((1L, 16000000000000L))))
  }

  test("regularization shrinks biases toward zero") {
    val train = df((1L, 10L, 5.0), (2L, 10L, 3.0))
    val test = df((1L, 20L, 4.0))
    // µ = 4e6; λ1 = 0: bu(1) = 1e6 -> p = 5 -> err 1
    // λ1 = 1: bu(1) = 1e6 div 2 = 5e5 -> p = 4.5 -> err 0.5
    val strict = BiasedBaseline.mseByUser(train, test, 0L, 0L).collect().head.getLong(2)
    val shrunk = BiasedBaseline.mseByUser(train, test, 1L, 0L).collect().head.getLong(2)
    assert(strict == 1000000000000L && shrunk == 250000000000L)
  }

  test("negative-dividend division truncates toward zero (cross-engine pin)") {
    // single user below the mean: Σ(r − µ) = −1e6 over 2 rows with
    // λ1 = 3 -> −1e6 div 5 = −200000 exactly (floor would differ on
    // non-divisible sums: −1e6 div 3 = −333333, not −333334)
    val train = df((1L, 10L, 3.0), (1L, 20L, 4.0), (2L, 30L, 4.5))
    // µ = (3 + 4 + 4.5)e6 div 3 = 3833333
    val test = df((1L, 30L, 4.0))
    val out = BiasedBaseline.mseByUser(train, test, 3L, 0L).collect().head
    // bu(1) = ((3e6 − 3833333) + (4e6 − 3833333)) div 5 = −666666 div 5 = −133333
    // bi(30) = (4.5e6 − 3833333 − bu(2)) div 1; bu(2) = 666667 div 4 = 166666
    //        = (4500000 − 3833333 − 166666) = 500001
    // p = 3833333 − 133333 + 500001 = 4200001; err = 200001
    assert(out.getLong(2) == 200001L * 200001L)
  }
}
