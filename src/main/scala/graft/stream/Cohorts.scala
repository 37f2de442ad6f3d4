package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the product-analytics rollup next to
  * [[Funnel]]: users grouped by the week of their first activity
  * (the cohort), counted as retained in each later week they were
  * active. Weeks are pure epoch-millis buckets (`ms div 7·86400000`)
  * — no calendar/timezone arithmetic, so the bucketing is exact and
  * engine-independent.
  *
  * Physical plan: ONE corpus shuffle — group by user collecting the
  * DISTINCT week set (bounded by the corpus age in weeks, not by the
  * user's event count — a bot with a billion events still carries at
  * most corpus-weeks entries), then derive the cohort as the set's
  * min and explode to (cohort, offset) counts, which aggregate
  * map-side to a cohort-weeks × offsets table.
  */
object Cohorts {

  /** Returns (cohort_week, week_offset, users): how many of the
    * users first active in `cohort_week` were active again
    * `week_offset` weeks later (offset 0 = the cohort size itself
    * when every cohort user is active in their first week — true by
    * construction). */
  def retention(events: DataFrame, userCol: String, tsMsCol: String): DataFrame =
    events
      .select(col(userCol).as("user_id"),
        expr(s"$tsMsCol div ${7L * 86400000L}L").as("w"))
      .groupBy("user_id").agg(collect_set(col("w")).as("ws"))
      .select(array_min(col("ws")).as("cohort_week"), explode(col("ws")).as("w"))
      .groupBy(col("cohort_week"), (col("w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users"))
}
