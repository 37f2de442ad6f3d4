package graft

import graft.util.GlobalPercentile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GlobalPercentileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** reference: continuous quantile over an in-memory sorted array,
    * the probed DuckDB/Postgres formula */
  private def refQuantile(xs: Seq[Double], q: Double): Double = {
    val s = xs.sorted
    val rn = (s.length - 1) * q
    val f = math.floor(rn)
    val frac = rn - f
    if (frac == 0.0) s(f.toInt)
    else s(f.toInt) * (1.0 - frac) + s(f.toInt + 1) * frac
  }

  test("recursive selection == in-memory quantile, forced deep recursion") {
    val rnd = new scala.util.Random(42)
    val xs = Seq.fill(5000)(rnd.nextDouble() * 1000.0 - 200.0)
    val df = xs.toDF("x")
    val qs = Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.9, 0.999, 1.0)
    // nBuckets 8 / threshold 16: many refinement rounds before any sort
    val got = GlobalPercentile.quantileCont(df, "x", qs, nBuckets = 8, sortThreshold = 16)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (q <- qs) assert(got(q) == refQuantile(xs, q), s"q=$q")
  }

  test("duplicate-dense data terminates via single-valued slices (no deep sort)") {
    // 10k rows, only 7 distinct values: every slice pins min==max fast
    val xs = (0 until 10000).map(i => (i % 7).toDouble * 3.5)
    val got = GlobalPercentile.quantileCont(xs.toDF("x"), "x",
      Seq(0.5, 0.9), nBuckets = 4, sortThreshold = 2)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(0.5) == refQuantile(xs, 0.5))
    assert(got(0.9) == refQuantile(xs, 0.9))
  }

  test("orderStats returns exact 1-based order statistics; nulls ignored") {
    val df = Seq[java.lang.Double](5.0, null, 1.0, 3.0, 2.0, null, 4.0).toDF("x")
    val got = GlobalPercentile.orderStats(df, "x", Seq(1L, 3L, 5L),
      nBuckets = 4, sortThreshold = 2)
    assert(got == Map(1L -> 1.0, 3L -> 3.0, 5L -> 5.0))
  }

  test("GlobalRank.ecdf: exact ranks/percentiles, corpus windows bucket-partitioned") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(900)(rnd.nextDouble() * 50.0)
    val df = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "x")
    val out = graft.util.GlobalRank.ecdf(df, "x", Seq($"id"), nBuckets = 16)
    // every empty-partition window runs on the skinny bucket table only
    import org.apache.spark.sql.execution.window.WindowExec
    val wins = out.queryExecution.sparkPlan.collect { case w: WindowExec => w }
    wins.filter(_.partitionSpec.isEmpty).foreach { w =>
      val cols = w.child.output.map(_.name)
      assert(!cols.contains("x") && !cols.contains("id"), s"corpus window: $cols")
    }
    val got = out.collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    val expect = xs.zipWithIndex.sortBy { case (v, i) => (v, i) }.zipWithIndex
      .map { case ((_, id), r) => id.toLong -> ((r + 1L, (r + 1L) * 1000000L / 900L)) }.toMap
    assert(got == expect)
  }

  test("no empty-partition window above the sort threshold (plan shape by construction)") {
    // With cnt > sortThreshold the round is groupBy(width_bucket) —
    // verify a full recursion at threshold 1 never plans a corpus-wide
    // window by checking the answer still lands while Spark's single
    // WindowExec use is confined to <=threshold subsets: here every
    // needed slice refines down to min==max or 1 row, so the one-task
    // sort never receives more than sortThreshold rows by contract.
    val xs = (1 to 2000).map(_.toDouble)
    val got = GlobalPercentile.quantileCont(xs.toDF("x"), "x", Seq(0.37),
      nBuckets = 16, sortThreshold = 8)
      .collect().head.getDouble(1)
    assert(got == refQuantile(xs, 0.37))
  }

  test("grouped selection == per-group in-memory quantile, skewed group sizes") {
    val rnd = new scala.util.Random(7)
    // group sizes 10 / 400 / 6000 (1-600x skew), duplicates in the big one
    val rows =
      Seq.fill(10)(("tiny", rnd.nextDouble() * 10)) ++
      Seq.fill(400)(("mid", rnd.nextDouble() * 1000 - 500)) ++
      Seq.fill(6000)(("big", (rnd.nextInt(300)).toDouble / 3.0))
    val df = rows.toDF("g", "x")
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = GlobalPercentile.quantileContByGroup(df, Seq("g"), "x", qs,
        nBuckets = 8, sortThreshold = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byG = rows.groupBy(_._1).map { case (g, v) => g -> v.map(_._2) }
    assert(got.size == 3 * qs.size)
    for ((g, xs) <- byG; q <- qs)
      assert(got((g, q)) == refQuantile(xs, q), s"g=$g q=$q")
  }

  test("grouped: multi-column groups, single-row groups, null values ignored") {
    val df = Seq(
      ("a", 1, Some(5.0)), ("a", 1, Some(1.0)), ("a", 1, None),
      ("a", 2, Some(9.0)),
      ("b", 1, Some(2.0)), ("b", 1, Some(4.0)), ("b", 1, Some(8.0)))
      .toDF("g1", "g2", "x")
    val got = GlobalPercentile.quantileContByGroup(df, Seq("g1", "g2"), "x", Seq(0.5),
        nBuckets = 4, sortThreshold = 1)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got == Map(("a", 1) -> 3.0, ("a", 2) -> 9.0, ("b", 1) -> 4.0))
  }

  test("winsorizeByGroup clips at the exact per-group quantile bounds") {
    val rnd = new scala.util.Random(3)
    val rows = Seq.tabulate(2000)(i => (if (i % 2 == 0) "a" else "b",
      rnd.nextDouble() * 100 + (if (i % 2 == 0) 0 else 500)))
    val df = rows.toDF("g", "x")
    val out = GlobalPercentile.winsorizeByGroup(df, Seq("g"), "x", 0.1, 0.9,
        nBuckets = 8, sortThreshold = 16)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    out.groupBy(_._1).foreach { case (g, rs) =>
      val lo = refQuantile(byG(g), 0.1); val hi = refQuantile(byG(g), 0.9)
      rs.foreach { case (_, x, gl, gh, w) =>
        assert(gl == lo && gh == hi, s"$g bounds $gl/$gh != $lo/$hi")
        assert(w == math.min(math.max(x, lo), hi), s"$g clip of $x")
      }
      // winsorization actually bites on both tails
      assert(rs.exists(r => r._5 == lo && r._2 < lo))
      assert(rs.exists(r => r._5 == hi && r._2 > hi))
    }
  }

  test("winsorizeByGroup passes NULL values through as NULL, never the low bound") {
    // greatest/least skip NULL operands, so an unguarded clip would turn
    // a NULL x into the group's lo — the fabrication ADVICE r12 flagged
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", Some(4.0)), ("a", None), ("b", None))
      .toDF("g", "x")
    val out = GlobalPercentile.winsorizeByGroup(df, Seq("g"), "x", 0.25, 0.75,
      nBuckets = 4, sortThreshold = 2).collect()
    val nullRows = out.filter(_.isNullAt(1))
    assert(nullRows.length == 2)
    // clipped column stays NULL for NULL inputs — in group a (which has
    // bounds) AND in group b (all-NULL group, no bounds at all)
    nullRows.foreach(r => assert(r.isNullAt(4), s"NULL x fabricated ${r.get(4)}"))
    // non-null rows still clip
    val a2 = out.find(r => !r.isNullAt(1) && r.getDouble(1) == 1.0).get
    assert(a2.getDouble(4) == a2.getDouble(2)) // clipped up to lo
  }

  test("madOutliersByGroup: Hampel fences from exact medians, degenerate MAD handled") {
    // group a: values 0..20 plus planted spikes 1000, -1000
    //   med = 10, MAD = median(|x-10|) over 23 values = 5
    //   fence = 3.5 * 1.4826 * 5 = 25.9455 -> only the spikes flag
    // group b: 9x identical 7.0 plus one 8.0 -> MAD 0, the 8.0 flags
    val rows = ((0 to 20).map(v => ("a", v.toDouble)) ++
      Seq(("a", 1000.0), ("a", -1000.0)) ++
      Seq.fill(9)(("b", 7.0)) :+ ("b", 8.0))
    val out = GlobalPercentile.madOutliersByGroup(rows.toDF("g", "x"), Seq("g"), "x",
        k = 3.5, nBuckets = 8, sortThreshold = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(4)))
    val aOut = out.filter(x => x._1 == "a" && x._3).map(_._2).toSet
    assert(aOut == Set(1000.0, -1000.0), s"a outliers: $aOut")
    val bOut = out.filter(x => x._1 == "b" && x._3).map(_._2).toSet
    assert(bOut == Set(8.0), s"b outliers (MAD=0 path): $bOut")
    assert(out.count(!_._3) == rows.size - 3)
  }
}
