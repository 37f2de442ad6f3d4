package graft

import graft.util.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def expected(keys: Seq[String], m: Int): Map[String, Long] = {
    val n = keys.size
    keys.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (m + 1) > n }.toMap
  }

  private def run(keys: Seq[String], m: Int, parts: Int): Map[String, Long] =
    HeavyHitters.exact(keys.toDF("k").repartition(parts), "k", m)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("== GROUP BY/HAVING on skewed data, across m and partitionings") {
    val rnd = new scala.util.Random(11)
    // zipf-ish: a few hot keys + a long tail of near-distinct ones
    val keys = (1 to 20000).map { _ =>
      val r = rnd.nextInt(100)
      if (r < 30) "hot1" else if (r < 45) "hot2" else if (r < 52) "hot3"
      else s"tail${rnd.nextInt(5000)}"
    }
    for (m <- Seq(2, 5, 20, 100); parts <- Seq(1, 4, 13)) {
      assert(run(keys, m, parts) == expected(keys, m), s"m=$m parts=$parts")
    }
  }

  test("adversarial MG eviction churn cannot lose a true heavy hitter") {
    // alternate the heavy key with bursts of distinct fillers sized to
    // force a decrement-all after every burst
    // 3050/12050 rows: strictly above the n/4 threshold
    val keys = (1 to 3000).flatMap(i => Seq("heavy", s"f${i}a", s"f${i}b", s"f${i}c")) ++
      Seq.fill(50)("heavy")
    for (parts <- Seq(1, 7)) {
      val got = run(keys, 3, parts)
      assert(got == expected(keys, 3))
      assert(got.contains("heavy"))
    }
  }

  test("no key above threshold -> empty result") {
    val keys = (1 to 1000).map(i => s"k${i % 100}") // all at 1%
    assert(run(keys, 5, 4).isEmpty) // threshold n/6 ~ 16.7%
  }

  test("strict alternation at m=1 empties the MG summary — empty result, no error") {
    val keys = (1 to 500).flatMap(_ => Seq("a", "b"))
    assert(run(keys, 1, 1).isEmpty) // both at exactly n/2, strict > excludes
  }

  test("nulls are dropped from both the count base and the candidates") {
    val df = Seq(Some("a"), Some("a"), Some("a"), None, Some("b")).toDF("k")
    val got = HeavyHitters.exact(df, "k", 1)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // n = 4 non-null; a=3 > 4/2; b=1 not
    assert(got == Map("a" -> 3L))
  }

  test("recount plan has no join — candidates arrive as an In/InSet filter") {
    val df = (1 to 500).map(i => if (i % 2 == 0) "x" else s"t$i").toDF("k")
    val plan = HeavyHitters.exact(df, "k", 4).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"expected filter+agg only:\n$plan")
  }
}
