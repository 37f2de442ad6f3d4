package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Backward as-of join: enrich each left row with the latest right row
  * whose timestamp is <= the left row's timestamp, per key group — the
  * point-in-time lookup every event/feature pipeline needs (label a
  * click with the most recent profile snapshot, price a trade at the
  * last quote, join a metric to the config active when it fired).
  *
  * Spark has no ASOF JOIN operator, and the naive encodings both die at
  * scale: a range-condition join plans as BroadcastNestedLoop/cartesian
  * (O(n·m) per key), and "join all earlier rows then keep the max"
  * materializes the full history per event. This kernel is the
  * merge-sort shape instead: UNION the two sides, one window over
  * (keys, ts) carrying the last-seen right payload forward, keep left
  * rows. ONE hash exchange on the keys (same as any keyed shuffle), a
  * per-partition sort, zero join nodes — the 100 TB plan you'd write by
  * hand on a 1000-executor cluster. Skewed keys sort more rows but
  * never build a per-key candidate set.
  *
  * Semantics (pinned by the q77 DuckDB `ASOF LEFT JOIN` oracle and
  * AsofJoinSpec):
  *  - match condition is `right.ts <= left.ts` (a right row AT the left
  *    timestamp matches — right sorts before left on ties);
  *  - left rows with no earlier right row keep NULL payload (left
  *    outer);
  *  - the matched row's payload is taken verbatim — a NULL payload
  *    column in the matched right row stays NULL (the carry is one
  *    nullable struct per right row, not per-column last(ignoreNulls),
  *    which would leak older values through the match);
  *  - equal right timestamps within a key group are broken by
  *    `tiebreak` ascending — the max-tiebreak row wins, so results are
  *    deterministic under any partitioning. Callers without a natural
  *    unique tiebreak should pre-dedupe to one right row per (keys, ts).
  */
object AsofJoin {

  /** @param right    lookup side; must contain `by`, `rightTs`, `tiebreak`
    * @param payload  right columns to carry onto each left row (emitted
    *                 as `asof_<name>`; `asof_ts` = matched timestamp is
    *                 always included)
    * @param tiebreak right column ordering equal-ts rows (max wins) */
  def asofBackward(left: DataFrame, right: DataFrame, by: Seq[String],
                   leftTs: String, rightTs: String,
                   payload: Seq[String], tiebreak: String): DataFrame = {
    require(by.nonEmpty, "asofBackward: at least one key column")
    val leftCols = left.columns.toSeq
    val carried = struct(col(rightTs).as("asof_ts") +: payload.map(c => col(c).as(s"asof_$c")): _*)

    val r = right.select(
      by.map(col) ++ Seq(
        col(rightTs).as("__ts"), lit(0).as("__side"),
        col(tiebreak).cast("long").as("__tie"), carried.as("__carry")) ++
        leftCols.filterNot(by.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val l = left.select(
      by.map(col) ++ Seq(
        col(leftTs).as("__ts"), lit(1).as("__side"),
        lit(Long.MaxValue).as("__tie"), lit(null).cast(r.schema("__carry").dataType).as("__carry")) ++
        leftCols.filterNot(by.contains).map(col): _*)

    // ties: right(0) before left(1); among right rows, tiebreak asc so
    // the LAST row the carry sees (and keeps) is the max-tiebreak one
    val w = Window.partitionBy(by.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = r.unionByName(l)
      .withColumn("__match", last(col("__carry"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val payloadOut = ("asof_ts" +: payload.map("asof_" + _))
      .map(c => matched("__match").getField(c).as(c))
    matched.select(by.map(col) ++ leftCols.filterNot(by.contains).map(col) ++ payloadOut: _*)
  }
}
