package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.TopK

/** Item-based collaborative filtering (itemKNN) over the rating
  * bipartite graph — the classic neighborhood recommender baseline the
  * reference's model zoo is benchmarked against (its recommenders are
  * all embedding-based — /root/reference/framework/recommender/
  * model_based package; this adds the memory-based family a user of
  * such a system runs as the sanity baseline).
  *
  * Similarity is **exact integer Jaccard** over relevant-interaction
  * sets: `sim(a,b) = cooc(a,b) * SCALE div (deg(a) + deg(b) -
  * cooc(a,b))`. Jaccard (not cosine) is deliberate: it is the standard
  * implicit-feedback choice and needs no sqrt, so every value is a
  * BIGINT that replays bit-for-bit in any engine (float cosine can't
  * cross engines; see the repo-wide scaled-integer oracle rule).
  *
  * Scale anatomy (the co-occurrence self-join is the classic itemCF
  * blowup — a user with d items emits d(d-1)/2 pairs, so one
  * pathological crawler account can emit billions):
  *   1. **Per-user interaction cap** (production itemCF standard):
  *      keep each user's top-`cap` relevant items by (rating DESC,
  *      item_id) through the [[TopK]] bounded-heap combine — pair
  *      emission is bounded by cap²/2 per user, no full per-user sort.
  *   2. Pair counting is a shuffle join on `user_id` followed by a
  *      map-side-combined count on (item_a, item_b); the `minCooc`
  *      prune (support threshold) cuts the pair table before any
  *      degree join.
  *   3. Degree attach is two shuffle joins against the skinny
  *      (item, deg) table — items-sized, AQE may broadcast it.
  *   4. Neighbor-list truncation and final per-user ranking run on
  *      the same TopK heap combine (k rows of state per live group,
  *      no WindowExec sort of the full candidate set).
  */
object ItemKnn {

  val Scale = 1000000L

  /** Relevant interactions (rating >= minRating), capped to the user's
    * top-`cap` items by (rating DESC, item_id ASC). Deterministic: the
    * tie column makes the capped set unique. */
  def relevantCapped(ratings: DataFrame, minRating: Double, cap: Int): DataFrame =
    TopK.perGroup(
      ratings.filter(col("rating") >= minRating).select("user_id", "item_id", "rating"),
      Seq("user_id"), "rating", Seq("item_id"), cap)
      .select("user_id", "item_id")

  /** Support-pruned co-occurrence pairs (item_a < item_b, cooc) over
    * the capped relevant set — also the edge list of the item
    * co-interaction projection graph ([[graft.graph.Triangles]] runs
    * on it). */
  def cooc(rel: DataFrame, minCooc: Int): DataFrame = {
    val left = rel.select(col("user_id"), col("item_id").as("item_a"))
    val right = rel.select(col("user_id"), col("item_id").as("item_b"))
    left.join(right, Seq("user_id"))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCooc)
  }

  /** Undirected item-item Jaccard similarities over the capped
    * relevant set; pairs with co-occurrence below `minCooc` are
    * pruned. Output: (item_a < item_b, cooc, deg_a, deg_b, sim). */
  def similarities(rel: DataFrame, minCooc: Int): DataFrame =
    similaritiesFrom(cooc(rel, minCooc), rel)

  /** [[similarities]] from a PREBUILT support-pruned cooc table over
    * the same `rel` — the shared-materialization entry point: callers
    * that also consume the raw co-occurrence projection (triangles,
    * trusses, link prediction) materialize `cooc(rel, minCooc)` once
    * and derive the similarity table from it instead of re-running
    * the capped pair join. Identical by construction when
    * `coocTab == cooc(rel, minCooc)`. */
  def similaritiesFrom(coocTab: DataFrame, rel: DataFrame): DataFrame = {
    val deg = rel.groupBy("item_id").agg(count(lit(1)).as("deg"))
    coocTab
      .join(deg.select(col("item_id").as("item_a"), col("deg").as("deg_a")), Seq("item_a"))
      .join(deg.select(col("item_id").as("item_b"), col("deg").as("deg_b")), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("cooc"), col("deg_a"), col("deg_b"),
        expr(s"cooc * ${Scale}L div (deg_a + deg_b - cooc)").as("sim"))
  }

  /** Symmetrized top-`k` neighbor lists per item by (sim DESC,
    * nbr_id ASC) — the model a serving layer would broadcast. */
  def neighbors(sims: DataFrame, k: Int): DataFrame = {
    val sym = sims.select(col("item_a").as("item_id"), col("item_b").as("nbr_id"), col("sim"))
      .unionByName(sims.select(col("item_b").as("item_id"), col("item_a").as("nbr_id"), col("sim")))
    TopK.perGroup(sym, Seq("item_id"), "sim", Seq("nbr_id"), k).drop("rank")
  }

  /** Top-`k` recommendations per user: score(u, j) = Σ sim(i, j) over
    * the user's capped relevant items i with j in i's neighbor list;
    * items the user has ALREADY rated (at any rating — not just the
    * relevant subset) are excluded via anti-join. Output:
    * (user_id, item_id, score, rank). */
  def recommend(allRatings: DataFrame, rel: DataFrame, nbrs: DataFrame, k: Int): DataFrame = {
    val cand = rel.join(nbrs, Seq("item_id"))
      .groupBy(col("user_id"), col("nbr_id"))
      .agg(sum("sim").as("score"))
      .select(col("user_id"), col("nbr_id").as("item_id"), col("score"))
    val unseen = cand.join(allRatings.select("user_id", "item_id"),
      Seq("user_id", "item_id"), "left_anti")
    TopK.perGroup(unseen, Seq("user_id"), "score", Seq("item_id"), k)
  }

  /** The full pipeline with the q123 parameterization. */
  def recs(ratings: DataFrame, minRating: Double, cap: Int, minCooc: Int,
           kNbrs: Int, kRecs: Int): DataFrame = {
    val rel = relevantCapped(ratings, minRating, cap)
    recommend(ratings, rel, neighbors(similarities(rel, minCooc), kNbrs), kRecs)
  }

  /** Time-windowed co-visitation lists — the "people who bought this
    * soon also bought" production primitive (the session/basket-scoped
    * variant of [[cooc]]): item pairs a user interacted with within
    * `windowMs` of each other, counted, support-pruned, symmetrized,
    * top-`k` per item by (count DESC, covis_id). Same cap²-bounded
    * pair join as the similarity chain — the window predicate only
    * FILTERS pairs, it never changes the join shape — and the final
    * cut rides the [[TopK]] bounded heap.
    *
    * @param ratings (user_id, item_id, rating, ts) with ts epoch-ms
    * @return (item_id, covis_id, cnt, rank ≤ k) */
  def covisitation(ratings: DataFrame, minRating: Double, cap: Int,
                   windowMs: Long, minCooc: Int, k: Int): DataFrame = {
    val rel = TopK.perGroup(
      ratings.filter(col("rating") >= minRating)
        .select("user_id", "item_id", "rating", "ts"),
      Seq("user_id"), "rating", Seq("item_id"), cap)
      .select("user_id", "item_id", "ts")
    val pairs = rel.select(col("user_id"), col("item_id").as("item_a"), col("ts").as("ts_a"))
      .join(rel.select(col("user_id"), col("item_id").as("item_b"), col("ts").as("ts_b")),
        Seq("user_id"))
      .filter(col("item_a") < col("item_b") &&
        abs(col("ts_a") - col("ts_b")) <= windowMs)
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCooc)
    val sym = pairs.select(col("item_a").as("item_id"), col("item_b").as("covis_id"), col("cnt"))
      .unionByName(pairs.select(col("item_b").as("item_id"), col("item_a").as("covis_id"), col("cnt")))
    TopK.perGroup(sym, Seq("item_id"), "cnt", Seq("covis_id"), k)
  }
}
