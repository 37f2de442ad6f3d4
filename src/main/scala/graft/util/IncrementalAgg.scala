package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental (algebraic) aggregate maintenance — refresh a grouped
  * statistics table from an update batch without rescanning the base
  * corpus: for decomposable aggregates, state ⊕ agg(delta) equals
  * agg(base ∪ delta) exactly. At 100 TB this is the difference between
  * touching a day's ingest and touching the corpus: the refresh scans
  * |delta| rows plus the skinny state table (one row per group), and
  * the merge is a group-keyed union re-aggregate — no join.
  *
  * State per (group, value column): n, sum, min, max — sum/count kept
  * as exact longs on caller-scaled integers so repeated refreshes
  * accumulate no float error and the result is bit-equal to a full
  * recompute (the q113 oracle recomputes from scratch). Derived means
  * are computed AT READ TIME from (sum, n), never stored — storing a
  * mean would make the state non-mergeable.
  */
object IncrementalAgg {

  /** Aggregate `df` to the mergeable state: groupCols + (n, sum, min,
    * max) over `valueCol` (a long — scale doubles to integers first,
    * the house oracle-parity rule). */
  def state(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum"),
        min(valueCol).as("min"), max(valueCol).as("max"))

  /** Merge any number of state tables: the algebraic combine (counts
    * add, sums add, mins min, maxes max). Groups present in only one
    * state pass through. Associative and commutative — refresh order
    * and batching cannot change the result. */
  def merge(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"))
  }

  /** One refresh step: previous state ⊕ the update batch. */
  def refresh(prevState: DataFrame, delta: DataFrame,
              groupCols: Seq[String], valueCol: String): DataFrame =
    merge(Seq(prevState, state(delta, groupCols, valueCol)), groupCols)

  // ---- mergeable distinct counts -------------------------------------
  // COUNT(DISTINCT x) is NOT algebraic — distinct sets from two batches
  // can't be combined from their counts alone, and keeping the sets
  // would make the state corpus-sized. The standard fix is a mergeable
  // sketch: an HLL register vector unions by per-register MAX, so the
  // merged estimate is order- and batching-independent and the state
  // stays a few KiB per group regardless of cardinality. Estimates are
  // approximate (~1-2% at the default lgK) — the exact columns above
  // stay exact; use these for the distinct dimension only.

  /** State with an extra `dsk` HLL-sketch column over `distinctCol`. */
  def stateWithDistinct(df: DataFrame, groupCols: Seq[String],
                        valueCol: String, distinctCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum"),
        min(valueCol).as("min"), max(valueCol).as("max"),
        hll_sketch_agg(col(distinctCol)).as("dsk"))

  /** Merge states carrying sketches: exact columns combine
    * algebraically, sketches by register union. */
  def mergeWithDistinct(states: Seq[DataFrame], groupCols: Seq[String]): DataFrame = {
    require(states.nonEmpty, "mergeWithDistinct needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"),
        hll_union_agg(col("dsk")).as("dsk"))
  }

  /** One refresh step for sketch-carrying state. */
  def refreshWithDistinct(prevState: DataFrame, delta: DataFrame,
                          groupCols: Seq[String], valueCol: String,
                          distinctCol: String): DataFrame =
    mergeWithDistinct(
      Seq(prevState, stateWithDistinct(delta, groupCols, valueCol, distinctCol)),
      groupCols)

  /** Read-time estimate: replaces the sketch with `approx_distinct`. */
  def estimateDistinct(state: DataFrame): DataFrame =
    state.withColumn("approx_distinct", hll_sketch_estimate(col("dsk"))).drop("dsk")

  // ---- mergeable distinct-set CHURN (KMV) ----------------------------
  // The HLL `dsk` answers "how many distinct keys"; it CANNOT answer
  // "how many keys are NEW / how many LEFT" across a refresh — register
  // union has no difference form. A KMV synopsis ([[Kmv]], q196) does:
  // the k smallest distinct hashes are a coordinated sample on which
  // membership in either period is exactly testable, so the refresh
  // surface below carries a ≤ k-long `kmv` array per group and derives
  // new-key / lost-key estimates from pure array algebra — every value
  // DuckDB-replayable (md5 h52 + per-group rank + EXISTS membership).

  /** State with a bounded KMV synopsis column `kmv` over `keyCol`
    * (NULL-rendering keys dropped, matching count DISTINCT); a group
    * with no hashable key keeps its exact columns with an empty
    * synopsis. */
  def stateWithKmv(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   keyCol: String, k: Int, seed: Long): DataFrame =
    state(df, groupCols, valueCol)
      .join(Kmv.sketchGrouped(df, groupCols, Seq(keyCol), k, seed)
        .withColumnRenamed("ks", "kmv"), groupCols, "left")
      .withColumn("kmv", coalesce(col("kmv"), expr("cast(array() as array<bigint>)")))

  /** Merge kmv-carrying states: exact columns combine algebraically;
    * synopses merge as "k smallest distinct of the union" (the [[Kmv]]
    * merge law) — per group the collected state is ≤ |states|·k longs,
    * bounded by the merge fan-in, never the data. */
  def mergeWithKmv(states: Seq[DataFrame], groupCols: Seq[String], k: Int): DataFrame = {
    require(states.nonEmpty, "mergeWithKmv needs at least one state")
    states.reduce(_ unionByName _)
      .groupBy(groupCols.map(col): _*)
      .agg(sum("n").as("n"), sum("sum").as("sum"),
        min("min").as("min"), max("max").as("max"),
        slice(array_sort(array_distinct(flatten(collect_list(col("kmv"))))),
          1, k).as("kmv"))
  }

  /** One refresh step for kmv-carrying state. */
  def refreshWithKmv(prevState: DataFrame, delta: DataFrame,
                     groupCols: Seq[String], valueCol: String,
                     keyCol: String, k: Int, seed: Long): DataFrame =
    mergeWithKmv(
      Seq(prevState, stateWithKmv(delta, groupCols, valueCol, keyCol, k, seed)),
      groupCols, k)

  /** Per-group KEY CHURN between two kmv-carrying states (the [[Kmv]]
    * setOps algebra, grouped): for each group, the union synopsis of
    * the two ≤ k-long arrays estimates how many keys are NEW in `b`
    * (∉ a) and how many LEFT (∈ a, ∉ b). Groups present on one side
    * only churn against an empty synopsis (full outer). Output:
    * groupCols + (k_h1, est_h1_e6, k_h2, est_h2_e6, k_new, est_new_e6,
    * k_lost, est_lost_e6). */
  def kmvChurn(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val g = groupCols.map(col)
    val emptyArr = expr("cast(array() as array<bigint>)")
    def ratioEst(part: Column): Column =
      when(size(col("__ku")) > 0,
        round(size(part).cast("double") / size(col("__ku")).cast("double") *
          Kmv.estE6(col("__ku"), k)).cast("long")).otherwise(lit(0L))
    a.select((g :+ col("kmv").as("__ka")): _*)
      .join(b.select((g :+ col("kmv").as("__kb")): _*), groupCols, "full_outer")
      .withColumn("__ka", coalesce(col("__ka"), emptyArr))
      .withColumn("__kb", coalesce(col("__kb"), emptyArr))
      .withColumn("__ku",
        slice(array_sort(array_distinct(concat(col("__ka"), col("__kb")))), 1, k))
      .withColumn("__new_u",
        array_except(array_intersect(col("__ku"), col("__kb")), col("__ka")))
      .withColumn("__lost_u",
        array_except(array_intersect(col("__ku"), col("__ka")), col("__kb")))
      .select((g :+
        size(col("__ka")).cast("long").as("k_h1") :+
        round(Kmv.estE6(col("__ka"), k)).cast("long").as("est_h1_e6") :+
        size(col("__kb")).cast("long").as("k_h2") :+
        round(Kmv.estE6(col("__kb"), k)).cast("long").as("est_h2_e6") :+
        size(col("__new_u")).cast("long").as("k_new") :+
        ratioEst(col("__new_u")).as("est_new_e6") :+
        size(col("__lost_u")).cast("long").as("k_lost") :+
        ratioEst(col("__lost_u")).as("est_lost_e6")): _*)
  }
}
