package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-bucketed range join — point-in-interval matching as an
  * EQUI-join. Spark plans a raw `l.ts BETWEEN r.start AND r.end`
  * theta-join as BroadcastNestedLoopJoin: every point row is compared
  * against every interval (O(P×I) work and, past the broadcast
  * threshold, an outright failure). Discretizing the shared axis into
  * fixed-width bins turns it into a shuffled equi-join on the bin id —
  * the standard range-join optimization (Databricks exposes it as a
  * RANGE_JOIN hint; stock Spark has no equivalent, so it is an
  * operator here).
  *
  * Exactness: each interval explodes to the bins it spans, each point
  * maps to exactly ONE bin, and integer `div` truncation is monotone —
  * so every true (point, interval) pair meets in exactly one bin
  * (the point's), the exact BETWEEN filter after the equi-join drops
  * bin-collision false positives, and no dedup stage is needed.
  *
  * Scale shape: one exchange pair on `__bin`. Interval blowup is
  * (width div binWidth + 1) rows per interval — pick binWidth ≳ the
  * typical interval width for ≤2 bins per interval. Hot bins (many
  * points and intervals in one stripe of the axis) are an AQE
  * skew-join case, same as any hot equi-join key.
  */
object RangeJoin {

  /** Matches of `points.pointCol ∈ [intervals.startCol, intervals.endCol]`
    * (inclusive both ends), all three long-typed on one comparable
    * axis; column names must be simple identifiers and distinct.
    * Returns the joined rows (all columns of both inputs). Intervals
    * with `end < start` match nothing, exactly like BETWEEN. */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      binWidth: Long): DataFrame = {
    require(binWidth >= 1, s"binWidth must be >= 1, got $binWidth")
    // sequence(a, b) steps BACKWARD when a > b, which would fabricate
    // bins for inverted intervals — drop them (BETWEEN-equivalent)
    val iv = intervals.filter(col(endCol) >= col(startCol))
      .withColumn("__bs", expr(s"$startCol div ${binWidth}L"))
      .withColumn("__be", expr(s"$endCol div ${binWidth}L"))
      .withColumn("__bin", explode(expr("sequence(__bs, __be)")))
      .drop("__bs", "__be")
    val pt = points.withColumn("__bin", expr(s"$pointCol div ${binWidth}L"))
    pt.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
