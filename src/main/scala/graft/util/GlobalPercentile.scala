package graft.util

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT global quantiles/median WITHOUT a global sort — distributed
  * selection by recursive range refinement (the generalization of the
  * q137/q145 value-rollup pattern the r10 verdict asked for).
  *
  * A naive exact percentile needs a total order → one task sorts the
  * corpus. Here each round instead:
  *   1. bins the current value range into `nBuckets` monotone
  *      `width_bucket` slices — a skinny map-side-combined aggregate
  *      (count/min/max per bucket, ≤ nBuckets+1 rows to the driver);
  *   2. walks the cumulative counts to find which slice holds each
  *      wanted order statistic;
  *   3. recurses into only those slices (a pushed-down range filter on
  *      the cached corpus), until a slice is single-valued (min==max:
  *      the order statistic IS that value — the duplicate-heavy case
  *      terminates here without any sort) or small enough that a
  *      one-task sort of `sortThreshold` rows is trivial.
  * Expected rows per slice shrink ~nBuckets× per round, so depth is
  * O(log_nBuckets(N)) skinny jobs per wanted rank group — at 100 TB
  * the corpus is scanned a handful of times (from cache) and nothing
  * corpus-sized is ever sorted, shuffled to one task, or collected.
  *
  * `quantile_cont` parity: the continuous-quantile interpolation is
  * the Postgres/DuckDB formula `lo·(1−frac) + hi·frac` with
  * `rn = (N−1)·q`, `frac = rn − floor(rn)` — probed bit-equal against
  * DuckDB's builtin (the `lo + frac·(hi−lo)` variant drifts one ulp on
  * real data and hash-mismatches).
  */
object GlobalPercentile {

  /** Exact continuous quantiles of `valueCol` (nulls ignored, cast to
    * double) at each q in `qs` → one row per q: (q, value). */
  def quantileCont(df: DataFrame, valueCol: String, qs: Seq[Double],
                   nBuckets: Int = 4096, sortThreshold: Long = 1000000L): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      "quantileCont: qs must be within [0, 1]")
    val spark = df.sparkSession
    val base = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val mm = base.agg(count(lit(1)), min("__v"), max("__v")).head
      val n = mm.getLong(0)
      require(n > 0, s"quantileCont: no non-null values in $valueCol")
      val ranksNeeded = qs.flatMap { q =>
        val rn = (n - 1) * q
        val f = math.floor(rn).toLong
        if (rn == f) Seq(f + 1) else Seq(f + 1, f + 2)
      }.distinct.sorted
      val stats = solve(base, mm.getDouble(1), mm.getDouble(2), n,
        ranksNeeded, nBuckets, sortThreshold, depth = 0).toMap
      val rows = qs.map { q =>
        val rn = (n - 1) * q
        val f = math.floor(rn)
        val lo = stats(f.toLong + 1)
        val frac = rn - f
        val v = if (frac == 0.0) lo
                else lo * (1.0 - frac) + stats(f.toLong + 2) * frac
        (q, v)
      }
      import spark.implicits._
      rows.toDF("q", "value")
    } finally base.unpersist(blocking = false)
  }

  /** Exact order statistics: value at each 1-based `rank` of the
    * ascending order of non-null `valueCol`. */
  def orderStats(df: DataFrame, valueCol: String, ranks: Seq[Long],
                 nBuckets: Int = 4096, sortThreshold: Long = 1000000L): Map[Long, Double] = {
    val base = df.select(col(valueCol).cast("double").as("__v"))
      .filter(col("__v").isNotNull)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val mm = base.agg(count(lit(1)), min("__v"), max("__v")).head
      val n = mm.getLong(0)
      require(ranks.nonEmpty && ranks.forall(r => r >= 1 && r <= n),
        s"orderStats: ranks must be within [1, $n]")
      solve(base, mm.getDouble(1), mm.getDouble(2), n,
        ranks.distinct.sorted, nBuckets, sortThreshold, depth = 0).toMap
    } finally base.unpersist(blocking = false)
  }

  /** Resolve `ranks` (1-based WITHIN the [lo, hi] subset, ascending)
    * to values. `cnt` = subset row count. */
  private def solve(base: DataFrame, lo: Double, hi: Double, cnt: Long,
                    ranks: Seq[Long], nBuckets: Int, sortThreshold: Long,
                    depth: Int): Seq[(Long, Double)] = {
    if (lo == hi) return ranks.map(_ -> lo) // single-valued slice
    val sub = base.filter(col("__v") >= lo && col("__v") <= hi)
    // depth cap: adjacent-double ranges can stop shrinking; the subset
    // there is duplicate-dense and min==max slices have already peeled
    // off, so a direct sort is the honest endgame
    if (cnt <= sortThreshold || depth >= 64) {
      val rset = ranks
      return sub
        .withColumn("__rn", row_number().over(Window.orderBy("__v")).cast("long"))
        .filter(col("__rn").isInCollection(rset))
        .collect().map(r => r.getLong(1) -> r.getDouble(0)).toSeq
    }
    val bstats = sub
      .groupBy(width_bucket(col("__v"), lit(lo), lit(hi), lit(nBuckets)).as("__b"))
      .agg(count(lit(1)).as("__c"), min("__v").as("__blo"), max("__v").as("__bhi"))
      .orderBy("__b")
      .collect() // bounded: ≤ nBuckets + 1 rows
    val out = scala.collection.mutable.Buffer.empty[(Long, Double)]
    var acc = 0L
    var remaining = ranks
    for (r <- bstats if remaining.nonEmpty) {
      val c = r.getLong(1)
      val inBucket = remaining.takeWhile(_ <= acc + c)
      if (inBucket.nonEmpty) {
        remaining = remaining.drop(inBucket.size)
        val local = inBucket.map(_ - acc)
        val sols = solve(base, r.getDouble(2), r.getDouble(3), c,
          local, nBuckets, sortThreshold, depth + 1)
        val byLocal = sols.toMap
        out ++= inBucket.zip(local).map { case (orig, l) => orig -> byLocal(l) }
      }
      acc += c
    }
    out.toSeq
  }
}
