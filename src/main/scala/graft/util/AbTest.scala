package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass Welch two-sample t statistics over every variant pair —
  * the A/B experiment readout a training-data pipeline runs after
  * interleaving corpus variants (Welch 1947; the unequal-variance form
  * is the only safe default when variant sizes differ by orders of
  * magnitude, which at 100 TB they always do).
  *
  * Scale shape: ONE map-side-combined aggregation collapses the corpus
  * to a |variants|-row moment table (n, Σx, Σx²) — the data is never
  * touched again; the pair join is a broadcast-sized self-join of that
  * tiny table. Exactness contract (the [[Profile.corrMatrix]]
  * discipline): moments are exact integers (values pre-quantized to
  * cents by the caller, variance numerators in decimal(38,0) with a
  * LOUD overflow raise), and the float tail is a PINNED op tree —
  * exact-integer → double conversions, then one division per ratio,
  * one add, one sqrt — so any engine replaying the same tree from the
  * same integers lands on the identical bits; t/df are rounded ONCE
  * to e6.
  */
object AbTest {

  /** Per ordered variant pair (g1 < g2): exact moments and the Welch
    * t statistic + Welch–Satterthwaite degrees of freedom, e6-rounded.
    * Groups with n < 2 are dropped (no variance); t_e6/df_e6 are NULL
    * when both sample variances are zero (se = 0: t undefined). */
  def welch(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = col(valueCol).cast("long")
    val m = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"), sum(v).as("s"), sum(v * v).as("ss"))
      .filter(col("n") >= 2)
    val a = m.select(col("g").as("g1"), col("n").as("n1"),
      col("s").as("s1"), col("ss").as("ss1"))
    val b = m.select(col("g").as("g2"), col("n").as("n2"),
      col("s").as("s2"), col("ss").as("ss2"))
    // variance numerator n·Σx² − (Σx)² and denominator n²(n−1), both
    // exact decimal(38,0); NULL there with n ≥ 2 can only be overflow
    def varNum(n: String, s: String, ss: String) =
      col(n).cast(dec) * col(ss).cast(dec) - col(s).cast(dec) * col(s).cast(dec)
    def varDen(n: String) =
      col(n).cast(dec) * col(n).cast(dec) * (col(n) - 1).cast(dec)
    val v1 = varNum("n1", "s1", "ss1"); val v2 = varNum("n2", "s2", "ss2")
    val overflowed = v1.isNull || v2.isNull
    // pinned float tail: one division per exact ratio, one add, one sqrt
    val r1 = v1.cast("double") / varDen("n1").cast("double")
    val r2 = v2.cast("double") / varDen("n2").cast("double")
    val se = r1 + r2
    val mdiff = col("s1").cast("double") / col("n1").cast("double") -
      col("s2").cast("double") / col("n2").cast("double")
    val t = mdiff / sqrt(se)
    val dfW = (se * se) /
      (r1 * r1 / (col("n1") - 1).cast("double") +
        r2 * r2 / (col("n2") - 1).cast("double"))
    val guard = (c: org.apache.spark.sql.Column) =>
      when(overflowed, raise_error(lit(
          "welch: decimal(38,0) moment overflow — rescale the fixed-point input"))
          .cast("long"))
        .otherwise(when(v1 > 0 || v2 > 0, round(c * lit(1e6)).cast("long")))
    a.join(b, col("g1") < col("g2"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"),
        col("s1").as("sum1"), col("s2").as("sum2"),
        guard(t).as("t_e6"), guard(dfW).as("df_e6"))
  }
}
