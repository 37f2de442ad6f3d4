package graft

import graft.util.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def estimate(n: Int, b: Int): Double = {
    val df = (0 until n).map(i => s"key_$i").toDF("k")
    Sketches.hllEstimate(Sketches.hllRegisters(df, Seq("k"), b, 42L), b)
      .collect().head.getLong(3) / 1e6
  }

  test("HLL estimate lands within 3 sigma (1.04/sqrt(m)) across cardinalities") {
    for (n <- Seq(1000, 5000, 20000)) {
      val est = estimate(n, b = 10)
      val sigma = 1.04 / math.sqrt(1024.0)
      assert(math.abs(est - n) <= 3 * sigma * n,
        f"n=$n est=$est%.0f (err ${(est - n) / n * 100}%.1f%%)")
    }
  }

  test("HLL small range routes through linear counting (tight)") {
    val est = estimate(60, b = 10)
    assert(math.abs(est - 60) <= 6, s"linear-counting est=$est for n=60")
  }

  test("HLL registers: partition-invariant, duplicate-insensitive, merge by max") {
    val a = (0 until 3000).map(i => s"k$i").toDF("k")
    val b = (2000 until 5000).map(i => s"k$i").toDF("k")
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df, Seq("k"), 8, 1L)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val union = regs(a.union(b))
    assert(regs(a.union(b).repartition(13)) == union, "partitioning changed state")
    assert(regs(a.union(b).union(b)) == union, "duplicates changed state")
    val merged = (regs(a).toSeq ++ regs(b).toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2).max).toMap
    assert(merged == union, "max-merge of per-shard registers != union registers")
  }

  test("HLL overlap: intersection estimate tracks the exact overlap; disjoint sets near zero") {
    // A = 0..7999, B = 5000..12999 -> |A|=8000, |B|=8000, |A∩B|=3000.
    // Union error compounds three sketches; allow a 5-sigma-ish band
    // on the intersection (sigma_each = 1.04/32 at b=10)
    def keys(lo: Int, hi: Int) = (lo until hi).map(i => s"k_$i").toDF("k")
    val r = Sketches.hllOverlap(keys(0, 8000), keys(5000, 13000), Seq("k"),
      b = 10, seed = 42L).collect().head
    val (a, bb, u, inter) =
      (r.getLong(0) / 1e6, r.getLong(1) / 1e6, r.getLong(2) / 1e6, r.getLong(3) / 1e6)
    val sigma = 1.04 / math.sqrt(1024.0)
    assert(math.abs(a - 8000) <= 3 * sigma * 8000, s"est_a $a")
    assert(math.abs(bb - 8000) <= 3 * sigma * 8000, s"est_b $bb")
    assert(math.abs(u - 13000) <= 3 * sigma * 13000, s"est_union $u")
    assert(math.abs(inter - 3000) <= 5 * sigma * 13000,
      f"est_inter $inter%.0f vs exact 3000")
    // disjoint sets: the estimate collapses toward zero (sketch noise
    // can leave a small residue either side of 0)
    val d = Sketches.hllOverlap(keys(0, 5000), keys(10000, 15000), Seq("k"),
      b = 10, seed = 42L).collect().head.getLong(3) / 1e6
    assert(math.abs(d) <= 4 * sigma * 10000, f"disjoint inter $d%.0f not near 0")
  }

  test("CMS: est >= true count for every key; exact when the sketch is collision-free") {
    // 40 keys, zipf-ish counts, width 4096 >> keys: collisions absent
    // in practice for THIS seed — pinned by the equality check itself
    val rows = (0 until 40).flatMap(k => Seq.fill(k + 1)(s"key_$k")).toDF("k")
    val truth = (0 until 40).map(k => s"key_$k" -> (k + 1).toLong).toMap
    val queries = truth.keys.toSeq.toDF("k")
    val wide = Sketches.cmsEstimate(
      Sketches.cmsCounters(rows, Seq("k"), 4, 4096, 7L), queries, Seq("k"), 4, 4096, 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == truth, "width-4096 sketch should be exact on 40 keys")
    // narrow sketch: collisions inevitable, the guarantee is one-sided
    val narrow = Sketches.cmsEstimate(
      Sketches.cmsCounters(rows, Seq("k"), 4, 8, 7L), queries, Seq("k"), 4, 8, 7L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    truth.foreach { case (k, t) =>
      assert(narrow(k) >= t, s"$k: est ${narrow(k)} below true $t")
    }
  }

  test("CMS counters: partition-invariant and mergeable by counter addition") {
    val a = (0 until 500).map(i => s"k${i % 50}").toDF("k")
    val b = (0 until 300).map(i => s"k${i % 30}").toDF("k")
    def cnt(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounters(df, Seq("k"), 3, 64, 2L)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val union = cnt(a.union(b))
    assert(cnt(a.union(b).repartition(7)) == union)
    val merged = (cnt(a).toSeq ++ cnt(b).toSeq).groupBy(_._1)
      .view.mapValues(_.map(_._2).sum).toMap
    assert(merged == union, "sum-merge of per-shard counters != union counters")
  }

  test("HLL composes with Structured Streaming: register state == batch under slicing") {
    // the register table is a plain max-aggregate, so the STREAMING
    // form is just hllRegisters over a streaming DF in update mode —
    // no custom state code; last emitted value per idx is the state
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val keys = (0 until 4000).map(i => s"k$i")
    val input = MemoryStream[String]
    val q = Sketches.hllRegisters(input.toDS().toDF("k"), Seq("k"), 8, 1L)
      .writeStream.outputMode("update").format("memory")
      .queryName("hll_stream").start()
    try {
      keys.grouped(700).foreach { s => input.addData(s: _*); q.processAllAvailable() }
      val rows = spark.sql("SELECT * FROM hll_stream").collect()
        .map(r => r.getLong(0) -> r.getInt(1))
      // update mode re-emits a register on change: last emission wins,
      // and max is monotone so last == max
      val streamed = rows.zipWithIndex.groupBy(_._1._1)
        .view.mapValues(_.maxBy(_._2)._1._2).toMap
      val batch = Sketches.hllRegisters(keys.toDF("k"), Seq("k"), 8, 1L)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(streamed == batch)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS hll_stream")
    }
  }

  test("CMS weighted: counters accumulate the weight column") {
    val rows = Seq(("a", 5L), ("a", 7L), ("b", 1L)).toDF("k", "w")
    val est = Sketches.cmsEstimate(
      Sketches.cmsCounters(rows, Seq("k"), 2, 128, 3L, weightCol = Some("w")),
      Seq("a", "b").toDF("k"), Seq("k"), 2, 128, 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est == Map("a" -> 12L, "b" -> 1L))
  }

  test("per-column HLL (profileSketched): estimates match single-column sketches") {
    val df = (0 until 5000).map(i => (i.toLong % 700, (i % 40).toString))
      .toDF("a", "b")
    val byCol = Sketches.hllEstimateGrouped(
      Sketches.hllRegistersByColumn(df, Seq("a", "b"), 9, 5L), Seq("col"), 9)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    def single(c: String) = Sketches.hllEstimate(
      Sketches.hllRegisters(df.select(col(c).cast("string").as("k")), Seq("k"), 9, 5L), 9)
      .collect().head.getLong(3)
    assert(byCol("a") == single("a") && byCol("b") == single("b"),
      s"per-column != single-column: $byCol vs ${single("a")}/${single("b")}")
    // small-cardinality column b lands on linear counting, near-exact
    // LC std at (m=512, n=40) is ~1.3; 3-4 sigma band
    assert(math.abs(byCol("b") / 1e6 - 40.0) <= 5.0, s"b est ${byCol("b")}")
    val prof = graft.util.Profile.profileSketched(df, Seq("a", "b"), 9, 5L)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    assert(prof("a")._1 == 5000L && prof("b") == ((5000L, "0", "9")),
      s"profile stats: $prof") // lexicographic string extrema: "9" > "39"
  }
}
