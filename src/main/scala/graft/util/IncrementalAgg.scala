package graft.util

import org.apache.spark.sql.DataFrame
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
}
