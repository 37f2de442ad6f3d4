package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT global row_number + total count WITHOUT a single-partition
  * window — the rank decomposition the scalable splits run on
  * ([[graft.split.EdgeSplits]]), promoted to a public primitive
  * (exact ECDF/percentile-rank columns, dense global ids over sorted
  * data, top-N cutoffs by exact position all need it).
  *
  * `bucket` must be a MONOTONE coarsening of the FIRST order column
  * with bounded cardinality (≤ a few thousand): per-bucket counts
  * collapse to one skinny map-side-combined aggregate, the exclusive
  * cumulative offsets + grand total live on that bounded table alone
  * (the only empty-partition windows run there), and every corpus row
  * gets `rank = bucket offset + within-bucket row_number` from a
  * window PARTITIONED by bucket — at most one bucket's rows per task
  * sort, never the corpus. Helpers: [[graft.split.EdgeSplits.longBucket]]
  * (top bits of a full-range long), [[graft.split.EdgeSplits.hexBucket]]
  * (md5-hex prefix), `width_bucket` over an eagerly-probed min/max for
  * physical value columns.
  */
object GlobalRank {

  /** @return df + `rankCol` (1-based exact global rank under
    *         `orderKey`) + `totalCol` (total row count) */
  def withGlobalRank(df: DataFrame, orderKey: Seq[Column], bucket: Column,
                     rankCol: String = "rn", totalCol: String = "n_total"): DataFrame = {
    val tagged = df.withColumn("__b", bucket)
    // both windows below run on the bounded per-bucket count table
    // (one row per occupied bucket), never on corpus rows
    val base = tagged.groupBy("__b").agg(count(lit(1)).as("__c"))
      .withColumn("__base", coalesce(
        sum("__c").over(Window.orderBy("__b")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn(totalCol, sum("__c").over(Window.partitionBy()))
      .select(col("__b"), col("__base"), col(totalCol))
    tagged.join(broadcast(base), Seq("__b"))
      .withColumn(rankCol,
        col("__base") + row_number().over(
          Window.partitionBy("__b").orderBy(orderKey: _*)))
      .drop("__b", "__base")
  }

  /** Exact empirical CDF of a numeric column: every row tagged with
    * its 1-based global rank under (`valueCol`, tiebreak) and
    * `pct_e6 = rank·10⁶ div N`. Buckets by `width_bucket` over an
    * eagerly-probed min/max (one skinny aggregate at plan-build). */
  def ecdf(df: DataFrame, valueCol: String, tiebreak: Seq[Column],
           nBuckets: Int = 1022): DataFrame = {
    val v = col(valueCol)
    val mm = df.agg(min(v), max(v)).head
    val bucket =
      if (mm.isNullAt(0) || mm.get(0) == mm.get(1)) lit(0L) // degenerate: one bucket
      else width_bucket(v, lit(mm.get(0)), lit(mm.get(1)), lit(nBuckets))
    withGlobalRank(df, v +: tiebreak, bucket)
      .withColumn("pct_e6", expr("rn * 1000000L div n_total"))
  }
}
