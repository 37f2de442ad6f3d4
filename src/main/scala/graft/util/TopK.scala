package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group top-k: `row_number()` over (orderCol desc|asc,
  * tieCols asc) filtered to `rank <= k`, planned through Spark 3.5+'s
  * `WindowGroupLimit` rule — the filter-adjacent rank shape inserts a
  * Partial group-limit BEFORE the exchange, so the shuffle carries at
  * most n_groups × n_input_partitions × k rows (the spec's listener
  * A/B pins the bound), and every operator stays whole-stage-codegen'd
  * UnsafeRow processing.
  *
  * History (r14 optimization): this replaced a hand-rolled
  * `df.rdd.aggregateByKey(boundedHeap)` combine with the same shuffle
  * bound. The heap had the right asymptotics but paid the RDD
  * boundary: Tungsten→GenericRow deserialization of the whole corpus,
  * boxed `Ordering[Row]` comparisons through reflective `Comparable`,
  * and a `createDataFrame` re-serialization — measured 78 CPU-s for
  * top-3-per-order over 600k rows (q113) vs ~4 CPU-s through the
  * window. The window's map-side partial limit does sort each input
  * partition, but that is a codegen'd radix-capable UnsafeRow sort —
  * strictly cheaper than per-row boxing at every scale measured
  * (guide §4: avoid non-codegen row-at-a-time paths in hot operators).
  *
  * Determinism contract unchanged: `tieCols` must make rows within a
  * group distinct; null ordering is Spark's default (desc → NULLS
  * LAST, asc → NULLS FIRST), which is exactly what the old heap
  * comparator pinned (nulls compare smallest).
  */
object TopK {

  /** Top `k` rows per `groupCols` group under (`orderCol` desc/asc,
    * `tieCols` asc). Returns the input columns plus `rank` (1-based). */
  def perGroup(df: DataFrame, groupCols: Seq[String], orderCol: String,
               tieCols: Seq[String], k: Int, descending: Boolean = true): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(groupCols.nonEmpty && tieCols.nonEmpty, "group and tie columns required")
    val ord = (if (descending) col(orderCol).desc else col(orderCol).asc) +:
      tieCols.map(col(_).asc)
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(ord: _*)
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }
}
