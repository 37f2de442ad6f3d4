package graft

import graft.eval.RankAgreement
import org.scalatest.funsuite.AnyFunSuite

class RankAgreementSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tau(a: Seq[(Long, Long, Int)], b: Seq[(Long, Long, Int)]) =
    RankAgreement.kendallTau(
      a.toDF("user_id", "item_id", "rank"), b.toDF("user_id", "item_id", "rank"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("identical rankings give tau 10^6; full reversal gives -10^6") {
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3))
    assert(tau(a, a)(1L) == ((3L, 3L, 1000000L)))
    val rev = Seq((1L, 10L, 3), (1L, 20L, 2), (1L, 30L, 1))
    assert(tau(a, rev)(1L) == ((3L, 0L, -1000000L)))
  }

  test("hand-computed partial agreement over the SHARED items only") {
    // shared: 10, 20, 30 (item 40 only in a, 50 only in b — ignored)
    // a-order: 10 < 20 < 30; b-order: 20 < 10 < 30
    // pairs: (10,20) discordant, (10,30) concordant, (20,30) concordant
    // tau = (2 - 1) / 3
    val a = Seq((1L, 10L, 1), (1L, 20L, 2), (1L, 30L, 3), (1L, 40L, 4))
    val b = Seq((1L, 20L, 1), (1L, 10L, 2), (1L, 30L, 3), (1L, 50L, 4))
    assert(tau(a, b)(1L) == ((3L, 2L, 1000000L / 3)))
  }

  test("users with fewer than two shared items are absent; users independent") {
    val a = Seq((1L, 10L, 1), (2L, 10L, 1), (2L, 20L, 2))
    val b = Seq((1L, 10L, 1), (2L, 10L, 2), (2L, 20L, 1))
    val out = tau(a, b)
    assert(!out.contains(1L)) // one shared item, no pairs
    assert(out(2L) == ((1L, 0L, -1000000L)))
  }
}
