package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch in exact-integer state — the
  * [[Sketches]] house style (deterministic, shard-mergeable,
  * DuckDB-replayable) applied to the one summary the incremental-agg
  * family couldn't refresh from deltas: percentiles.
  *
  * Design is the DDSketch idea (Masson, Lee & Rim, VLDB 2019:
  * relative-error-bounded log buckets) rebuilt on PURE INTEGER
  * arithmetic so two engines can never disagree at a bucket boundary
  * (floating log2 rounds differently at powers of two; `length(bin(v))`
  * does not):
  *
  *  - |v| < 2^s: the bucket IS the value (exact singletons);
  *  - |v| ≥ 2^s: with e = floor(log2 v) = length(bin(v))−1 and
  *    t = e − s, bucket = t·2^s + (v >> t) — the top s+1 bits tile
  *    [(t+1)·2^s, (t+2)·2^s) contiguously, so the index is MONOTONE in
  *    v and each bucket spans a ≤ 2^−s relative range;
  *  - negative v mirror to −1 − bucket(−v) (monotone across the full
  *    signed line; v = Long.MinValue is rejected by the caller's cast).
  *
  * State is the relational form: one (group, qb, cnt) row per occupied
  * bucket — counts ADD under union, so any sharding/batching of the
  * input yields the identical merged state (the q177/q178 register
  * discipline). A group's bucket count is bounded by ~64·2^s + 2^s
  * regardless of row count — the state stays KiB-sized per group at
  * any corpus scale.
  *
  * Read-time estimate: nearest-rank r = floor(q·(n−1)) + 1, answer =
  * the representative (upper bound, mirrored for negatives — errs away
  * from zero) of the first bucket whose cumulative count reaches r.
  * Deterministic, and within 2^−s relative error of the exact
  * continuous quantile's neighborhood ranks. The cumulative window
  * runs over the per-group BUCKET ROLLUP (≤ buckets rows), never the
  * corpus — the [[GlobalPercentile]] plan discipline.
  */
object QuantileSketch {

  /** Bucket index of nonnegative SQL fragment `v` (callers wrap sign). */
  private def posIdx(v: String, s: Int): String = {
    val cap = 1L << s
    s"""(CASE WHEN $v < ${cap}L THEN $v
       |  ELSE cast(length(bin($v)) - 1 - $s as bigint) * ${cap}L
       |       + shiftright($v, length(bin($v)) - 1 - $s) END)""".stripMargin
  }

  /** Bucket index of the long column `vCol` (signed, monotone). */
  def bucketIdx(vCol: String, s: Int): Column =
    expr(s"""CASE WHEN $vCol >= 0L THEN ${posIdx(vCol, s)}
            |  ELSE -1L - ${posIdx(s"(- $vCol)", s)} END""".stripMargin)

  /** Representative (signed upper-magnitude bound) of bucket column
    * `idxCol`: exact for singleton buckets, the bucket's largest
    * magnitude otherwise. */
  def repValue(idxCol: String, s: Int): Column = {
    val cap = 1L << s
    def pos(i: String) =
      s"""(CASE WHEN $i < ${2 * cap}L THEN $i
         |  ELSE shiftleft(($i % ${cap}L) + ${cap}L + 1L,
         |                 cast($i div ${cap}L as int) - 1) - 1L END)""".stripMargin
    expr(s"""CASE WHEN $idxCol >= 0L THEN ${pos(idxCol)}
            |  ELSE - ${pos(s"(-1L - $idxCol)")} END""".stripMargin)
  }

  /** Sketch state: (groupCols, qb, cnt) — NULL values are skipped
    * (they carry no rank). `valueCol` must be a long. */
  def state(df: DataFrame, groupCols: Seq[String], valueCol: String,
            s: Int = 5): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .withColumn("qb", bucketIdx(valueCol, s))
      .groupBy((groupCols.map(col) :+ col("qb")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge any number of state tables: counts add per (group, bucket).
    * Associative + commutative — sharding cannot change the result. */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "quantile merge needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy((groupCols.map(col) :+ col("qb")): _*)
      .agg(sum("cnt").as("cnt"))
  }

  /** One refresh step: previous state ⊕ the update batch. */
  def refresh(prevState: DataFrame, delta: DataFrame,
              groupCols: Seq[String], valueCol: String, s: Int = 5): DataFrame =
    merge(Seq(prevState, state(delta, groupCols, valueCol, s)), groupCols)

  /** Sketch-based per-group winsorization — the ONE-PASS 100-TB clip:
    * [[GlobalPercentile.winsorizeByGroup]] is exact but pays one
    * breadth-wise selection job per refinement round; this variant
    * reads both bounds from the mergeable bucket sketch (one grouped
    * count + a rollup — a single shuffle), at the sketch's ≤ 2^−s
    * relative error. Clip bounds are the bucket REPRESENTATIVES, so
    * they are deterministic integers and the whole transform replays
    * in DuckDB. NULL values pass through as NULL (the r12 ADVICE
    * contract — greatest/least skip NULLs, so the clip is guarded).
    * @return input + `<valueCol>_lo`, `<valueCol>_hi`, `<valueCol>_w` */
  def winsorizeByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       loQ: Double, hiQ: Double, s: Int = 5): DataFrame = {
    require(loQ >= 0 && hiQ <= 1 && loQ < hiQ,
      s"sketch winsorize: need 0 <= loQ < hiQ <= 1, got $loQ/$hiQ")
    val qs = quantiles(state(df, groupCols, valueCol, s), groupCols,
      Seq(loQ, hiQ), s)
    val bounds = qs.groupBy(groupCols.map(col): _*)
      .agg(max(when(col("q") === loQ, col("value"))).as(s"${valueCol}_lo"),
        max(when(col("q") === hiQ, col("value"))).as(s"${valueCol}_hi"))
    df.join(broadcast(bounds), groupCols, "left")
      .withColumn(s"${valueCol}_w",
        when(col(valueCol).isNull, lit(null).cast("long"))
          .otherwise(least(greatest(col(valueCol), col(s"${valueCol}_lo")),
            col(s"${valueCol}_hi"))))
  }

  /** Quantile read: (groupCols, q, value) for each requested q —
    * nearest-rank selection over the cumulative bucket rollup.
    *
    * Both the cumulative count AND the per-group total ride windows
    * over the SAME partitioning, so they share one exchange and the
    * state subtree is evaluated exactly once. (The previous form
    * computed the total with a separate groupBy and joined it back:
    * the state's whole upstream plan — in q189, a three-scan
    * refresh chain — was duplicated on each side of that join, and
    * the join added a third exchange. Guide §2.4/§3.3: same result,
    * one subtree, one exchange.) */
  def quantiles(st: DataFrame, groupCols: Seq[String], qs: Seq[Double],
                s: Int = 5): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles: qs in [0, 1]")
    val g = groupCols.map(col)
    val byG = Window.partitionBy(g: _*)
    st.withColumn("cum", sum("cnt").over(byG.orderBy("qb")))
      .withColumn("n", sum("cnt").over(byG))
      .withColumn("q", explode(lit(qs.toArray)))
      .filter(col("cum") >= (floor(col("q") * (col("n") - 1)) + 1).cast("long"))
      .groupBy((g :+ col("q")): _*)
      .agg(min("qb").as("qb"))
      .withColumn("value", repValue("qb", s))
      .select((g :+ col("q") :+ col("value")): _*)
  }
}
