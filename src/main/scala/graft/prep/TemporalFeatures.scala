package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Leakage-safe temporal training features: for every interaction,
  * the exponentially-decayed count of the SAME user's strictly-prior
  * interactions — the classic "how active was this user recently"
  * feature a ranking model trains on, computed without peeking at the
  * future (only events before the row, under the deterministic
  * (ts, item_id) order).
  *
  * Exact integers via the half-life-bucket trick ([[graft.model
  * .Trending]]): a prior event in bucket `b_now − k` weighs
  * `10⁶ div 2^k` (k clamped at `maxBuckets` = 40, beyond which the
  * weight is 0), and same-bucket priors weigh 10⁶ exactly. The
  * per-row sum decomposes into
  *
  *   1. a per-(user, bucket) count rollup (one map-side-combined
  *      aggregate, skinny),
  *   2. a BOUNDED 41-offset explode joining each row to its user's
  *      prior-bucket counts (never a per-row scan of history), and
  *   3. one (user, bucket) window for the strictly-earlier
  *      same-bucket count — partition size = a user's events within
  *      one half-life, the data-density bound.
  *
  * Nothing touches unbounded history: a user with years of events
  * costs the same 41 probes per row.
  */
object TemporalFeatures {

  /** @param events (user_id, item_id, ts) with ts epoch-ms; (user_id,
    *               item_id) must be unique (the rating-edge contract)
    * @return input rows + `prior_e6` (decayed prior-interaction count
    *         ×10⁶) */
  def decayedPriorCount(events: DataFrame, halfLifeMs: Long,
                        maxBuckets: Int = 40): DataFrame = {
    require(halfLifeMs >= 1 && maxBuckets >= 1 && maxBuckets <= 62,
      "temporal features: bad params")
    val ev = events.select(col("user_id"), col("item_id"), col("ts"))
      .withColumn("__b", expr(s"ts div ${halfLifeMs}L"))
    val counts = ev.groupBy(col("user_id"), col("__b").as("__bj"))
      .agg(count(lit(1)).as("__n"))
    val same = ev.withColumn("__prior_same",
      (row_number().over(Window.partitionBy("user_id", "__b")
        .orderBy(col("ts"), col("item_id"))) - 1).cast("long"))
    val decayed = same
      .withColumn("__k", explode(expr(s"sequence(1, $maxBuckets)")))
      .withColumn("__bj", col("__b") - col("__k"))
      .join(counts, Seq("user_id", "__bj")) // inner: absent buckets add 0
      .groupBy("user_id", "item_id")
      .agg(sum(expr("__n * (1000000L div shiftleft(1L, cast(__k as int)))"))
        .as("__decay"))
    same.join(decayed, Seq("user_id", "item_id"), "left")
      .select(col("user_id"), col("item_id"), col("ts"),
        (lit(1000000L) * col("__prior_same") + coalesce(col("__decay"), lit(0L)))
          .as("prior_e6"))
  }
}
