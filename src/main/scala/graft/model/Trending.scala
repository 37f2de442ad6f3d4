package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recency-decayed popularity ("trending") in EXACT integers: each
  * interaction contributes `10⁶ div 2^b`, b = age div halfLife (the
  * standard exponential half-life decay, bucketed to whole half-lives
  * so every weight is a power-of-two integer division that replays
  * bit-for-bit — fractional-exponent decay is a double and cannot
  * hash-match across engines). The classic "what's hot now" ranking a
  * popularity recommender ships next to its all-time list.
  *
  * Scale shape: one broadcast 1-row max-timestamp aggregate, one
  * map-side-combined groupBy(item), and a TakeOrderedAndProject
  * top-k (parallel per-partition partial top-N — never a global
  * single-task sort). Ages ≥ 40 half-lives clamp to weight 0
  * (10⁶ < 2⁴⁰), which also keeps the shift in range.
  */
object Trending {

  /** @param interactions (item_id, ts) with ts epoch-ms
    * @return top-`k` (item_id, score_e6, n) by decayed score */
  def trending(interactions: DataFrame, halfLifeMs: Long, k: Int): DataFrame = {
    require(halfLifeMs > 0 && k >= 1, "trending: positive halfLife and k")
    val mx = interactions.agg(max("ts").as("mx"))
    interactions.crossJoin(broadcast(mx))
      .select(col("item_id"),
        expr(s"1000000L div shiftleft(1L, cast(least((mx - ts) div ${halfLifeMs}L, 40L) as int))")
          .as("w"))
      .groupBy("item_id")
      .agg(sum("w").as("score_e6"), count(lit(1)).as("n"))
      .orderBy(col("score_e6").desc, col("item_id"))
      .limit(k)
  }
}
