package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-statement table profiling — the ANALYZE primitive every
  * ingest pipeline runs before trusting a new drop: row count plus
  * per-column non-null count, exact distinct count, min and max, all in
  * one Spark job.
  *
  * Scale shape: Catalyst rewrites the multi-column DISTINCT aggregate
  * into one Expand (×|cols| row multiplication, each replica carrying
  * one column's value) feeding two partial-aggregated hash exchanges —
  * the standard fused shape, ONE logical pass over the data regardless
  * of column count, never a per-column scan loop. Min/max/non-null ride
  * the same aggregate for free. Values stay in their native types (no
  * string canonicalization), so numeric extrema are exact.
  */
object Profile {

  /** One-row profile: n_rows plus {nonnull, distinct, min, max} per
    * requested column, columns named `<col>_nonnull` etc. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "Profile.profile: at least one column")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}_nonnull"),
      countDistinct(col(c)).as(s"${c}_distinct"),
      min(col(c)).as(s"${c}_min"),
      max(col(c)).as(s"${c}_max")))
    df.agg(count(lit(1)).as("n_rows"), aggs: _*)
  }
}
