package graft.model

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Per-key time-series forecasting: Holt's linear (double
  * exponential) smoothing — the classic trend-aware baseline
  * (Holt 1957; Hyndman & Athanasopoulos ch. 8):
  *
  *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
  *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1},   ŷ_{T+h} = l_T + h·b_T
  *
  * initialized l_0 = y_0, b_0 = y_1 − y_0 over the DENSE bucket
  * series (missing buckets count 0 — a gap is a real zero for event
  * counts).
  *
  * Spark shape: one skinny groupBy to per-(key, bucket) counts, a
  * bounded dense-range join (keys × T rows), one collect_list per key
  * (state = that key's series — T is bounded: it's a bucket count,
  * not a row count), and the recursion as ONE codegen'd `aggregate`
  * HOF over the ordered array. No window over raw rows, no driver
  * loop, every key independent.
  *
  * Oracle parity: the recursion is evaluated with the IDENTICAL
  * operation sequence DuckDB's recursive-CTE replay uses (l_t spelled
  * out twice inside b_t on both sides), so doubles stay bit-equal;
  * α/β default to exact binary fractions (1/2, 1/4) and outputs are
  * rounded to 4 places, the house float discipline. */
object Forecast {

  /** Dense per-key bucket series (missing buckets are real zeros for
    * counts): (keyCols..., ys ordered array) plus the 0-based last
    * bucket index — the shared front half of [[holtLinear]]/[[cusum]]. */
  private def denseSeries(df: DataFrame, keyCols: Seq[String], tsMs: Column,
                          bucketMs: Long): (DataFrame, Int) = {
    // TRUNCATING integer division (SQL `div`), matching the oracles'
    // DuckDB `//` for pre-epoch timestamps too — pmod-based floor
    // division would bucket ts < 0 one bucket lower than the replay
    // (the StreamingTrending division-parity contract)
    val keyed = df.select(keyCols.map(col) :+ tsMs.cast("long").as("__ms"): _*)
      .withColumn("__d", expr(s"__ms div ${bucketMs}L")).drop("__ms")
    val mm = keyed.agg(min("__d"), max("__d")).head
    require(!mm.isNullAt(0), "time series: empty input")
    val d0 = mm.getLong(0)
    val tMax = (mm.getLong(1) - d0).toInt // 0-based last bucket index
    val counts = keyed.groupBy(keyCols.map(col) :+ col("__d"): _*)
      .agg(count(lit(1)).as("__c"))
    val dense = keyed.select(keyCols.map(col): _*).distinct()
      .select(keyCols.map(col) :+ explode(sequence(lit(0), lit(tMax))).as("__i"): _*)
      .join(counts.withColumn("__i", (col("__d") - d0).cast("int")).drop("__d"),
        keyCols :+ "__i", "left")
      .select(keyCols.map(col) :+ col("__i") :+
        coalesce(col("__c"), lit(0L)).cast("double").as("__y"): _*)
    (dense.groupBy(keyCols.map(col): _*)
      .agg(expr("transform(sort_array(collect_list(struct(__i, __y))), e -> e.__y)").as("ys")),
      tMax)
  }

  /** @param tsMs    epoch-millis column
    * @param horizon  forecast steps past the last bucket
    * @return keyCols..., n_buckets, level, trend, forecast (round 4) */
  def holtLinear(df: DataFrame, keyCols: Seq[String], tsMs: Column,
                 bucketMs: Long, horizon: Int,
                 alpha: Double = 0.5, beta: Double = 0.25): DataFrame = {
    require(bucketMs >= 1 && horizon >= 0, "holtLinear: bad bucket/horizon")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1,
      s"holtLinear: alpha in (0,1], beta in [0,1], got $alpha/$beta")
    val (series, tMax) = denseSeries(df, keyCols, tsMs, bucketMs)
    require(tMax >= 1, "holtLinear: need at least 2 buckets for the trend init")
    val a = alpha; val b = beta
    // the t=1 step collapses ALGEBRAICALLY for any α, β:
    // l_1 = α·y_1 + (1−α)(y_0 + (y_1−y_0)) = y_1 and b_1 = y_1 − y_0
    // — so both engines initialize with those float-EXACT values and
    // recur from t=2, l_t spelled out twice inside b_t in the exact
    // op sequence the DuckDB recursive CTE evaluates
    val walk =
      s"""aggregate(
         |  slice(ys, 3, size(ys) - 2),
         |  named_struct('l', ys[1], 'b', ys[1] - ys[0]),
         |  (acc, v) -> named_struct(
         |     'l', ${a}D * v + ${1 - a}D * (acc.l + acc.b),
         |     'b', ${b}D * ((${a}D * v + ${1 - a}D * (acc.l + acc.b)) - acc.l) + ${1 - b}D * acc.b))""".stripMargin
    series
      .withColumn("__st", expr(walk))
      .select(keyCols.map(col) :+
        lit(tMax + 1).as("n_buckets") :+
        round(col("__st.l"), 4).as("level") :+
        round(col("__st.b"), 4).as("trend") :+
        round(col("__st.l") + lit(horizon.toDouble) * col("__st.b"), 4).as("forecast"): _*)
  }

  /** Holt–Winters ADDITIVE seasonal smoothing (triple exponential;
    * Winters 1960, Hyndman & Athanasopoulos ch. 8) per key — the rung
    * above [[holtLinear]] when the series has a known period m (weekly
    * seasonality over daily buckets):
    *
    *   l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
    *   b_t = β(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ(y_t − l_t) + (1−γ)·s_{t−m},  ŷ_{T+h} = l_T + h·b_T + s_{T+h−m}
    *
    * initialized the textbook way over the first two seasons: l₀ =
    * mean(season 1), b₀ = (mean(season 2) − mean(season 1))/m, sⱼ =
    * yⱼ − l₀ — all EXACT in doubles (integer counts sum exactly in any
    * order), so the only order-sensitive arithmetic is the recursion,
    * which runs in the q179 discipline: one codegen'd aggregate HOF
    * whose op sequence (l_t spelled out verbatim inside b_t and s_t)
    * is identical to the DuckDB recursive-CTE replay; α/β/γ default to
    * exact binary fractions. The seasonal state rides the fold as an
    * m-long array (s_{t−m} at the head, rotate-append each step).
    *
    * Scale shape: identical to [[holtLinear]] — per-key series are
    * bounded bucket counts, every key independent, no corpus window.
    *
    * @param horizon forecast steps past the last bucket, 1 ≤ h ≤ m
    * @return keyCols..., n_buckets, level, trend, season_h, forecast */
  def holtWinters(df: DataFrame, keyCols: Seq[String], tsMs: Column,
                  bucketMs: Long, m: Int, horizon: Int,
                  alpha: Double = 0.5, beta: Double = 0.25,
                  gamma: Double = 0.25): DataFrame = {
    require(bucketMs >= 1 && m >= 2, s"holtWinters: bad bucket/m $bucketMs/$m")
    require(horizon >= 1 && horizon <= m,
      s"holtWinters: horizon in [1, m], got $horizon")
    require(alpha > 0 && alpha <= 1 && beta >= 0 && beta <= 1 && gamma >= 0 && gamma <= 1,
      s"holtWinters: bad alpha/beta/gamma $alpha/$beta/$gamma")
    val (series, tMax) = denseSeries(df, keyCols, tsMs, bucketMs)
    require(tMax + 1 >= 2 * m,
      s"holtWinters: need >= ${2 * m} buckets for the two-season init, have ${tMax + 1}")
    val a = alpha; val b = beta; val g = gamma
    // l_t appears verbatim inside b_t and s_t — the replay op sequence
    val lT = s"${a}D * (v - acc.s[0]) + ${1 - a}D * (acc.l + acc.b)"
    val walk =
      s"""aggregate(
         |  slice(ys, ${m + 1}, size(ys) - $m),
         |  named_struct('l', __l0, 'b', __b0,
         |               's', transform(slice(ys, 1, $m), y -> y - __l0)),
         |  (acc, v) -> named_struct(
         |     'l', $lT,
         |     'b', ${b}D * (($lT) - acc.l) + ${1 - b}D * acc.b,
         |     's', concat(slice(acc.s, 2, ${m - 1}),
         |                 array(${g}D * (v - ($lT)) + ${1 - g}D * acc.s[0]))))""".stripMargin
    series
      .withColumn("__sum1",
        expr(s"aggregate(slice(ys, 1, $m), cast(0.0 as double), (x, y) -> x + y)"))
      .withColumn("__sum2",
        expr(s"aggregate(slice(ys, ${m + 1}, $m), cast(0.0 as double), (x, y) -> x + y)"))
      .withColumn("__l0", col("__sum1") / lit(m.toDouble))
      .withColumn("__b0", (col("__sum2") - col("__sum1")) / lit((m * m).toDouble))
      .withColumn("__st", expr(walk))
      .select(keyCols.map(col) :+
        lit(tMax + 1).as("n_buckets") :+
        round(col("__st.l"), 4).as("level") :+
        round(col("__st.b"), 4).as("trend") :+
        round(expr(s"__st.s[${horizon - 1}]"), 4).as("season_h") :+
        round(col("__st.l") + lit(horizon.toDouble) * col("__st.b") +
          expr(s"__st.s[${horizon - 1}]"), 4).as("forecast"): _*)
  }

  /** Two-sided CUSUM changepoint detection (Page 1954) per key over
    * the dense bucket series — the classic drift monitor a metrics
    * pipeline runs on ingested counts:
    *
    *   S⁺_t = max(0, S⁺_{t−1} + (y_t − μ − κ)),
    *   S⁻_t = max(0, S⁻_{t−1} + (μ − κ − y_t)),  alarm when either > h
    *
    * with μ the mean of the first `baseline` buckets (exact: integer
    * counts sum exactly in doubles regardless of order). The recursion
    * runs from bucket `baseline` onward as one codegen'd aggregate HOF
    * per key — the q179 oracle discipline (identical op sequence to
    * the DuckDB recursive-CTE replay, S′ spelled out twice inside the
    * alarm test, double-typed anchors).
    *
    * @return keyCols..., n_buckets, mu/s_hi/s_lo (round 4),
    *         first_alarm (bucket index, −1 when none) */
  def cusum(df: DataFrame, keyCols: Seq[String], tsMs: Column, bucketMs: Long,
            baseline: Int, kappa: Double, h: Double): DataFrame = {
    require(bucketMs >= 1 && baseline >= 1 && kappa >= 0 && h > 0,
      s"cusum: bad params bucket=$bucketMs baseline=$baseline kappa=$kappa h=$h")
    val (series, tMax) = denseSeries(df, keyCols, tsMs, bucketMs)
    require(tMax + 1 > baseline, s"cusum: need more than $baseline buckets, have ${tMax + 1}")
    val walk =
      s"""aggregate(
         |  slice(ys, ${baseline + 1}, size(ys) - $baseline),
         |  named_struct('shi', cast(0.0 as double), 'slo', cast(0.0 as double),
         |               'alarm', -1, 'i', ${baseline - 1}),
         |  (acc, v) -> named_struct(
         |     'shi', greatest(0.0d, acc.shi + (v - __mu - ${kappa}D)),
         |     'slo', greatest(0.0d, acc.slo + (__mu - ${kappa}D - v)),
         |     'alarm', case when acc.alarm >= 0 then acc.alarm
         |                   when greatest(0.0d, acc.shi + (v - __mu - ${kappa}D)) > ${h}D
         |                     or greatest(0.0d, acc.slo + (__mu - ${kappa}D - v)) > ${h}D
         |                   then acc.i + 1 else -1 end,
         |     'i', acc.i + 1))""".stripMargin
    series
      .withColumn("__mu",
        expr(s"aggregate(slice(ys, 1, $baseline), cast(0.0 as double), (a, v) -> a + v)") /
          lit(baseline.toDouble))
      .withColumn("__st", expr(walk))
      .select(keyCols.map(col) :+
        lit(tMax + 1).as("n_buckets") :+
        round(col("__mu"), 4).as("mu") :+
        round(col("__st.shi"), 4).as("s_hi") :+
        round(col("__st.slo"), 4).as("s_lo") :+
        col("__st.alarm").as("first_alarm"): _*)
  }
}
