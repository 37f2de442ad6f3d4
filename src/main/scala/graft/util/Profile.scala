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

  /** JOIN-KEY SKEW profile — the diagnostic a 100 TB join plan runs
    * FIRST: a shuffle hash-partitions by key, so one hot key pins one
    * task at `max_key_rows` while the average task gets
    * `n_rows / shufflePartitions`; the ratio of those two numbers IS
    * the straggler factor, and its ceiling is the salting fan-out that
    * levels it. Everything here is exact integer arithmetic over one
    * map-side-combined per-key count (skinny: ≤ distinct keys rows) —
    * the corpus itself is scanned once and never re-shuffled.
    *
    * Output, one row: n_rows, n_keys, max_key_rows, top1_share_permille
    * (⌊1000·max/n⌋), avg_key_rows (⌊n/keys⌋), p99_key_rows (exact: the
    * count at 1-based rank ⌈0.99·n_keys⌉ of per-key counts ascending,
    * ties by key rendering), skew_ratio_permille
    * (⌊1000·max_key_rows·shufflePartitions/n_rows⌋ — >1000 means the
    * hot key overflows an average task), suggested_salt
    * (⌈max_key_rows·shufflePartitions/n_rows⌉ capped ≥ 1 — the
    * AQE-skew-join split factor, or the explicit salt fan-out for the
    * [[ScaleJoins]] salted-join path). */
  def keySkew(df: DataFrame, keyCols: Seq[String],
              shufflePartitions: Int): DataFrame = {
    require(keyCols.nonEmpty, "keySkew: at least one key column")
    require(shufflePartitions >= 1, "keySkew: shufflePartitions >= 1")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.storage.StorageLevel
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("c")).select("c")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum("c").as("n_rows"),
      count(lit(1)).as("n_keys"), max("c").as("max_key_rows"))
    // exact p99 of per-key counts via the Coreness-style VALUE ROLLUP:
    // the window runs over distinct count-values only (a second
    // collapse of the already-skinny count table), never per-key rows
    val rollup = counts.groupBy("c").agg(count(lit(1)).as("f"))
      .withColumn("cum", sum("f").over(
        Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)))
    val p99 = rollup.crossJoin(broadcast(tot.select(col("n_keys").as("__nk"))))
      .filter(col("cum") >= ceil(lit(0.99) * col("__nk")).cast("long"))
      .agg(min("c").as("p99_key_rows"))
    val out = tot.crossJoin(broadcast(p99))
      .select(col("n_rows"), col("n_keys"), col("max_key_rows"),
        col("p99_key_rows"),
        expr("(1000L * max_key_rows) div n_rows").as("top1_share_permille"),
        expr("n_rows div n_keys").as("avg_key_rows"),
        expr(s"(1000L * max_key_rows * ${shufflePartitions}L) div n_rows")
          .as("skew_ratio_permille"),
        // ceiling division on positive longs under truncating div:
        // (a + b - 1) div b
        greatest(lit(1L), expr(
          s"(${shufflePartitions}L * max_key_rows + n_rows - 1L) div n_rows"))
          .as("suggested_salt"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // eager: pin the 1-row result, then free the count table
    counts.unpersist(blocking = false)
    out
  }

  /** Pairwise Pearson CORRELATION MATRIX over integer-scaled feature
    * columns in ONE scan — the feature-screening pass a training
    * pipeline runs before model fitting (drop near-duplicate features,
    * find leakage candidates). Callers pre-scale physical values to
    * exact longs (cents/permille, the house fixed-point rule), so
    * every moment is an EXACT decimal(38,0) sum under one map-side-
    * combined aggregate: p sums + p sum-of-squares + p(p−1)/2
    * sum-of-products, all riding a single 1-row reduction — no
    * per-pair scan loop, no `Statistics.corr` RDD detour, and exactly
    * one float expression
    *   corr = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²) · (n·Syy − Sy²))
    * evaluated from those exact integers identically on both engines
    * (the [[Sketches.hllEstimate]] float discipline). Zero-variance
    * columns yield NULL correlation (SQL semantics). Rows with a NULL
    * in ANY requested column are excluded from every moment (listwise
    * complete-case — `n` and the sums must count the same rows or the
    * formula fabricates correlations).
    *
    * Headroom: |value| ≤ v, n rows ⇒ the largest intermediate is
    * n²·v²·… bounded by n·Sxy ≤ n²v² — at v = 10⁹ cents and n = 10⁹
    * rows that is 10⁵⁴... beyond decimal(38). Practical bound: n·v²
    * per moment term and n²v² for the cross term must stay < 10³⁸,
    * i.e. v ≤ 10¹⁰ cents at n ≤ 10⁹ rows — ample for priced facts.
    * The envelope is ENFORCED loudly: under Spark's non-ANSI decimal
    * semantics an overflowing moment silently becomes NULL, so the
    * pair expression raises if any moment is NULL while n > 0
    * (complete-case inputs are non-null — NULL there IS overflow)
    * instead of emitting a NULL corr_e6 that reads as zero variance.
    *
    * @return one row per unordered pair (col_a < col_b by input
    *         order): (col_a, col_b, n, corr_e6). */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "corrMatrix: at least two columns")
    require(cols.distinct.size == cols.size, "corrMatrix: duplicate column")
    // LISTWISE complete-case: a row with ANY NULL among the feature
    // columns is excluded from every moment. Without this, n =
    // count(*) counts rows whose NULL values the sums skip — the
    // mismatch fabricates correlations (even out-of-range ones) that
    // both engines would agree on, so no oracle could catch it.
    val complete = df.na.drop(cols)
    val dec = "decimal(38,0)"
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size }
      yield (cols(i), cols(j))
    val aggs = cols.flatMap(c => Seq(
        sum(col(c).cast(dec)).as(s"__s_$c"),
        sum(col(c).cast(dec) * col(c).cast(dec)).as(s"__q_$c"))) ++
      pairs.map { case (a, b) =>
        sum(col(a).cast(dec) * col(b).cast(dec)).as(s"__p_${a}__$b") }
    val one = complete.agg(count(lit(1)).cast(dec).as("__n"), aggs: _*)
    val pairStructs = pairs.map { case (a, b) =>
      // LOUD overflow: complete-case inputs are non-null, so with
      // n > 0 a NULL moment can only mean the decimal(38,0) sum (or
      // the n·Sxy / Sx·Sy cross term) overflowed under non-ANSI
      // decimal semantics — raise instead of emitting a NULL corr_e6
      // the caller would misread as zero variance
      val cov = col("__n") * col(s"__p_${a}__$b") - col(s"__s_$a") * col(s"__s_$b")
      val va = col("__n") * col(s"__q_$a") - col(s"__s_$a") * col(s"__s_$a")
      val vb = col("__n") * col(s"__q_$b") - col(s"__s_$b") * col(s"__s_$b")
      val overflowed = col("__n") > 0 &&
        (cov.isNull || va.isNull || vb.isNull)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        when(overflowed, raise_error(lit(
            s"corrMatrix: decimal(38,0) moment overflow on pair ($a, $b) — " +
              "rescale the fixed-point inputs (see headroom envelope in scaladoc)"))
            .cast("long"))
          .otherwise(when(va > 0 && vb > 0, round(cov.cast("double") /
            sqrt(va.cast("double") * vb.cast("double")) * lit(1e6)).cast("long")))
          .as("corr_e6"))
    }
    one.select(explode(array(pairStructs: _*)).as("e")).select("e.*")
  }
}
