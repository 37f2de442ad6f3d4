package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass Poisson bootstrap (the large-scale bootstrap of Chamandy,
  * Muralidharan & Wager, "Teaching statistics at Google scale"):
  * uncertainty estimates for grouped means WITHOUT resampling passes.
  * Each row joins bootstrap replica r with weight k ~ Poisson(1) —
  * at corpus scale Binomial(n, 1/n) → Poisson(1), so Σk·x / Σk over
  * one replica is one bootstrap resample of the mean, and B replicas
  * ride ONE aggregation.
  *
  * Determinism contract: k is derived from the house md5-52 hash of
  * (row key, replica) by inverse-CDF against PRECOMPUTED integer
  * thresholds floor(P(K ≤ k)·2^52) (capped at k = 8: that cell absorbs
  * the P(K ≥ 8) = 1.0e-5 tail) — so any engine rebuilds the
  * identical weights, and replica means are EXACT integers via the
  * overflow-free decomposition m_e6 = (Σkx ÷ Σk)·1e6 + ((Σkx mod
  * Σk)·1e6) ÷ Σk. No doubles anywhere.
  *
  * Scale shape: one explode ×B (B bounded, default 32) and ONE
  * map-side-combined aggregation keyed (group, r) — (groups·B) skinny
  * rows cross the shuffle, the corpus never re-shuffles per replica.
  * The rank-based CI over B replica means is a window over groups·B
  * rows, never the corpus.
  */
object PoissonBootstrap {

  /** floor(P(Poisson(1) ≤ k) · 2^52) for k = 0..7; hashes ≥ the last
    * threshold take k = 8. Dyadic-free but EXACT as integers: both
    * engines compare the same 52-bit hash to the same literals. */
  private[graft] val CumThresholds: Array[Long] = {
    val p = new Array[Double](8)
    var term = math.exp(-1.0); var cum = 0.0
    for (k <- 0 until 8) {
      if (k > 0) term /= k
      cum += term; p(k) = cum
    }
    p.map(c => (c * 4503599627370496.0).toLong) // 2^52
  }

  /** CASE ladder mapping a 52-bit hash column to its Poisson(1) count. */
  private[graft] def poissonCount(h: Column): Column =
    CumThresholds.zipWithIndex.foldRight(lit(8): Column) {
      case ((t, k), acc) => when(h < t, k).otherwise(acc)
    }

  /** The same ladder as SQL text, for oracle replay: callers embed
    * `poissonCaseSql("h")`. */
  private[graft] def poissonCaseSql(h: String): String =
    CumThresholds.zipWithIndex
      .map { case (t, k) => s"WHEN $h < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")

  /** Per-(group, replica) bootstrap means of `valueCol` (an integer
    * column): (groupCols..., r, n_eff, mean_e6) where n_eff = Σk and
    * mean_e6 is the exact-integer micro-unit mean. Replicas whose Σk
    * is 0 (possible only for tiny groups) are emitted with NULL mean.
    */
  def replicaMeans(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   keyCols: Seq[String], b: Int = 32,
                   seed: Long = 42L): DataFrame = {
    require(b >= 2, s"poissonBootstrap: b >= 2, got $b")
    val h = Sketches.h52(seed, keyCols.map(col) :+ col("r"))
    // compute-amplification gate: the explode multiplies every input
    // row ×b and each replica row pays an md5 — a narrow scan that
    // arrives in fewer splits than cores (small files under the 4MB
    // open-cost floor) would run that b× amplified map nearly serial
    // (measured: q213 at 45 s wall / 56 CPU-s on 32 cores). One skinny
    // row-level exchange BEFORE the amplification buys full map
    // parallelism; at scale the scan already has ≥ cores splits and
    // the gate is a no-op. Results unaffected: weights are pure
    // functions of (key, replica, seed).
    val base = df.select((groupCols ++ keyCols).map(col) :+ col(valueCol).as("__v"): _*)
    val parts = df.sparkSession.sparkContext.defaultParallelism
    val basePar =
      if (base.rdd.getNumPartitions < parts) base.repartition(parts) else base
    basePar.select(col("*"), explode(sequence(lit(0), lit(b - 1))).as("r"))
      // the hash lands in ITS OWN projection before the CASE ladder:
      // the ladder references h once per arm (8×), and if Catalyst
      // inlines the md5→conv subtree into each arm the row pays up to
      // 8 md5s wherever codegen subexpression elimination doesn't fire
      // (measured: q213 CPU swung 152→718 s run-to-run). A non-cheap
      // aliased expression is NOT re-inlined by CollapseProject, so
      // this pins one hash evaluation per (row, replica).
      .select((groupCols.map(col) :+ col("r") :+ col("__v")
        :+ h.as("__h")): _*)
      .select((groupCols.map(col) :+ col("r") :+ col("__v")
        :+ poissonCount(col("__h")).cast("long").as("__k")): _*)
      .groupBy((groupCols.map(col) :+ col("r")): _*)
      .agg(sum("__k").as("n_eff"), sum(col("__k") * col("__v")).as("__skx"))
      .withColumn("mean_e6",
        when(col("n_eff") > 0,
          expr("(__skx div n_eff) * 1000000 + ((__skx % n_eff) * 1000000) div n_eff"))
          .otherwise(lit(null)))
      .drop("__skx")
  }

  /** Rank-based bootstrap CI per group from the replica means: lo =
    * `loRank`-th smallest, hi = `loRank`-th largest (1-based), plus
    * the replica-mean median-of-sorts (the B/2-th smallest). All
    * deterministic order statistics over B rows per group. */
  def ci(replicas: DataFrame, groupCols: Seq[String],
         loRank: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(loRank >= 1, "poissonBootstrap: loRank >= 1")
    val wAsc = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("mean_e6").asc, col("r").asc)
    val wDesc = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("mean_e6").desc, col("r").desc)
    replicas.filter(col("mean_e6").isNotNull)
      .withColumn("__ra", row_number().over(wAsc))
      .withColumn("__rd", row_number().over(wDesc))
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("b_eff"),
        max(when(col("__ra") === loRank, col("mean_e6"))).as("ci_lo_e6"),
        max(when(col("__rd") === loRank, col("mean_e6"))).as("ci_hi_e6"))
  }
}
