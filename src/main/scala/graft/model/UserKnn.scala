package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.TopK

/** User-based collaborative filtering (userKNN) — [[ItemKnn]]'s
  * transpose and the other half of the classic memory-based CF family:
  * similar USERS vote for the items they liked. Same exact integer
  * Jaccard (`cooc·10⁶ div (deg_a + deg_b − cooc)`) over
  * relevant-interaction sets, bit-replayable in any engine.
  *
  * Scale anatomy — the transpose flips which side blows up: user-user
  * co-occurrence pairs through ITEMS, so one viral item with d raters
  * emits d(d−1)/2 pairs (the itemCF hazard was the crawler USER).
  * Production userCF therefore caps BOTH dimensions:
  *   1. per-user cap (top-`capPerUser` by rating — bounds a user's
  *      vote spread, same as [[ItemKnn.relevantCapped]]);
  *   2. per-ITEM cap (top-`capPerItem` raters by rating, user_id
  *      tie) — bounds the pair join at capPerItem²/2 per item, the
  *      head-item analogue of the crawler cap. Degrees and the
  *      Jaccard denominator are over the double-capped set, so the
  *      similarity stays a true Jaccard of what the join actually
  *      sees.
  * Both caps ride the [[TopK]] bounded-heap combine (no windows);
  * neighbor lists and the final ranking too.
  */
object UserKnn {

  val Scale = 1000000L

  /** Double-capped relevant interactions → (user_id, item_id). */
  def relevantCapped2(ratings: DataFrame, minRating: Double,
                      capPerUser: Int, capPerItem: Int): DataFrame = {
    val perUser = TopK.perGroup(
      ratings.filter(col("rating") >= minRating)
        .select("user_id", "item_id", "rating"),
      Seq("user_id"), "rating", Seq("item_id"), capPerUser)
      .select("user_id", "item_id", "rating")
    TopK.perGroup(perUser, Seq("item_id"), "rating", Seq("user_id"), capPerItem)
      .select("user_id", "item_id")
  }

  /** Full pipeline → (user_id, item_id, score, rank ≤ kRecs). */
  def recs(ratings: DataFrame, minRating: Double, capPerUser: Int,
           capPerItem: Int, minCooc: Int, kNbrs: Int, kRecs: Int): DataFrame = {
    // rel feeds FOUR consumers (both cooc sides, deg, the candidate
    // join); its two group-limited window stages would re-evaluate per
    // consumer — ReuseExchange cannot dedup them because each consumer
    // needs a different downstream plan. One eager checkpoint of the
    // double-capped skinny pair table (A/B'd: wall 12.4 → ~7 s at
    // sf0.1; contrast the q205 NO where reuse already fired).
    val rel = relevantCapped2(ratings, minRating, capPerUser, capPerItem)
      .localCheckpoint(true)
    val deg = rel.groupBy("user_id").agg(count(lit(1)).as("deg"))
    val cooc = rel.select(col("item_id"), col("user_id").as("user_a"))
      .join(rel.select(col("item_id"), col("user_id").as("user_b")), Seq("item_id"))
      .filter(col("user_a") < col("user_b"))
      .groupBy("user_a", "user_b").agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
    val sims = cooc
      .join(deg.select(col("user_id").as("user_a"), col("deg").as("deg_a")), Seq("user_a"))
      .join(deg.select(col("user_id").as("user_b"), col("deg").as("deg_b")), Seq("user_b"))
      .select(col("user_a"), col("user_b"),
        expr(s"cooc * ${Scale}L div (deg_a + deg_b - cooc)").as("sim"))
    val sym = sims.select(col("user_a").as("user_id"), col("user_b").as("nbr_id"), col("sim"))
      .unionByName(sims.select(col("user_b").as("user_id"), col("user_a").as("nbr_id"), col("sim")))
    val nbrs = TopK.perGroup(sym, Seq("user_id"), "sim", Seq("nbr_id"), kNbrs).drop("rank")
    val cand = nbrs.join(rel.select(col("user_id").as("nbr_id"), col("item_id")), Seq("nbr_id"))
      .groupBy("user_id", "item_id").agg(sum("sim").as("score"))
    val unseen = cand.join(ratings.select("user_id", "item_id"),
      Seq("user_id", "item_id"), "left_anti")
    TopK.perGroup(unseen, Seq("user_id"), "score", Seq("item_id"), kRecs)
  }
}
