package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-statement table profiling — the ANALYZE primitive every
  * ingest pipeline runs before trusting a new drop: row count plus
  * per-column non-null count, exact distinct count, min and max, all in
  * one Spark job.
  *
  * Scale shape: Catalyst rewrites the multi-column DISTINCT aggregate
  * into one Expand (×|cols| row multiplication, each replica carrying
  * one column's value) feeding two partial-aggregated hash exchanges —
  * the standard fused shape, ONE logical pass over the data regardless
  * of column count, never a per-column scan loop. Min/max/non-null ride
  * the same aggregate for free. Values stay in their native types (no
  * string canonicalization), so numeric extrema are exact.
  */
object Profile {

  /** One-row profile: n_rows plus {nonnull, distinct, min, max} per
    * requested column, columns named `<col>_nonnull` etc. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.profile: at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_nonnull"),
      countDistinct(col(c)).as(s"${c}_distinct"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** The 100 TB variant of [[profile]]: per-column distinct counts via
    * the oracle-replayable [[Sketches]] HLL instead of exact
    * `count(DISTINCT c)` — the exact form Expands ×|cols| and shuffles
    * EVERY distinct value; this one carries ≤ |cols|·2^b register rows
    * of state. One sketch scan (the same Expand shape, bounded state)
    * plus one plain min/max/non-null aggregate. Output: one row per
    * column (col, nonnull, distinct_est_e6, min_s/max_s) — extrema are
    * LEXICOGRAPHIC on the rendered string (the uniform-schema trade;
    * [[profile]] keeps native-typed extrema). Pass integer-typed
    * columns for cross-engine string parity. */
  def profileSketched(df: DataFrame, cols: Seq[String], b: Int = 10,
                      seed: Long = 42L): DataFrame = {
    require(cols.nonEmpty, "profileSketched: at least one column")
    val est = Sketches.hllEstimateGrouped(
      Sketches.hllRegistersByColumn(df, cols, b, seed), Seq("col"), b)
      .select(col("col"), col("est_e6").as("distinct_est_e6"))
    val stats = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("v"))): _*)).as("e"))
      .filter(col("e.v").isNotNull)
      .groupBy(col("e.col").as("col"))
      .agg(count(lit(1)).as("nonnull"),
        min(col("e.v")).as("min_s"), max(col("e.v")).as("max_s"))
    stats.join(est, Seq("col"))
  }

  /** Per-group EXACT interpolated quantiles (the `percentile` aggregate
    * — position p·(n−1), linear interpolation, the same definition as
    * ANSI `percentile_cont` / DuckDB `quantile_cont`, which is what
    * makes it SQL-oracle-able). Output: group columns + `q_<label>` per
    * requested fraction.
    *
    * Scale caveat, by design: an exact per-group quantile buffers the
    * group's values — right for group-granularity stats (flags,
    * domains, shards), wrong for a group holding a whole 100 TB table.
    * For massive groups use [[approxGroupQuantiles]], the bounded-state
    * t-digest-style path. */
  def groupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"groupQuantiles: fractions must be in [0,1], got $ps")
    val qs = expr(s"percentile($valueCol, array(${ps.mkString(", ")}))")
    val out = ps.zipWithIndex.map { case (p, i) =>
      col("__qs").getItem(i).as(s"q_${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(qs.as("__qs"))
      .select(groupCols.map(col) ++ out: _*)
  }

  /** Bounded-memory variant: `approx_percentile` (GK sketch, mergeable,
    * O(1/accuracy) state per group regardless of group size) — the path
    * a 1000-executor deployment takes when a group can be arbitrarily
    * large. Same output shape as [[groupQuantiles]]. */
  def approxGroupQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                           ps: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val qs = expr(s"approx_percentile($valueCol, array(${ps.mkString(", ")}), $accuracy)")
    val out = ps.zipWithIndex.map { case (p, i) =>
      col("__qs").getItem(i).as(s"q_${(p * 100).round}")
    }
    df.groupBy(groupCols.map(col): _*).agg(qs.as("__qs"))
      .select(groupCols.map(col) ++ out: _*)
  }

  /** Tukey-fence outlier tagging — the numeric-quality filter of an
    * ingest pipeline: per group, a row is an outlier iff its value
    * falls outside [q1 − k·IQR, q3 + k·IQR] (k = 1.5 classically).
    * The quantile table is groups-sized, so it joins back by BROADCAST;
    * the corpus itself never shuffles — one aggregation pass + one
    * narrow tagged projection. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Double = 1.5): DataFrame = {
    val fences = groupQuantiles(df, groupCols, valueCol, Seq(0.25, 0.75))
      .select(groupCols.map(col) :+
        col("q_25").as("__q1") :+ col("q_75").as("__q3"): _*)
    val iqr = col("__q3") - col("__q1")
    df.join(broadcast(fences), groupCols)
      .withColumn("is_outlier",
        col(valueCol) < col("__q1") - lit(k) * iqr ||
          col(valueCol) > col("__q3") + lit(k) * iqr)
      .drop("__q1", "__q3")
  }
}
