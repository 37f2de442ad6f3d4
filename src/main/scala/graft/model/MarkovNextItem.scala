package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.TopK

/** First-order Markov next-item model — the classic sequential
  * recommendation baseline (Rendle et al. 2010's FPMC reduces to it
  * without factorization; every session-based recommender paper
  * benchmarks against it): count consecutive item transitions in each
  * user's timeline, serve the top-k next items per item.
  * [[graft.stream.Journeys.sessionTransitions]] is the event-TYPE
  * version of the same matrix; this one is item-grained and feeds a
  * recommender.
  *
  * Scale shape: one user-keyed groupBy collects each user's (ts,
  * item) events (per-group state = that user's history, the
  * [[graft.stream.Funnel]] sorted-walk contract — pre-cap hyperactive
  * users upstream if unbounded); consecutive pairs come from the
  * NARROW zip of the sorted array against its 1-shifted self (the
  * q144 bigram pattern — no window, no per-user second shuffle);
  * then one map-side-combined (prev, nxt) count and the [[TopK]]
  * bounded-heap cut. Self-transitions (repeat interactions) are
  * dropped — a "next item" recommender never proposes the item
  * itself.
  *
  * @return (prev, nxt, cnt ≥ minCount, rank ≤ k) */
object MarkovNextItem {

  /** Serve the model: each user's LAST item (max ts, item_id tie)
    * looks up its transition list; already-seen items anti-join out;
    * re-rank the survivors. The transition table is items×k rows —
    * broadcastable in most deployments, a plain equi-join otherwise.
    * Users whose last item has no surviving transitions are absent
    * (fall back to popularity upstream).
    *
    * @return (user_id, item_id, cnt, rank ≤ k) */
  def recommend(ratings: DataFrame, minCount: Long, kTrans: Int, k: Int): DataFrame = {
    val trans = transitions(ratings, minCount, kTrans)
    val last = TopK.perGroup(
      ratings.select("user_id", "item_id", "ts"),
      Seq("user_id"), "ts", Seq("item_id"), 1)
      .select(col("user_id"), col("item_id").as("prev"))
    last.join(trans.select(col("prev"), col("nxt").as("item_id"), col("cnt")), Seq("prev"))
      .join(ratings.select("user_id", "item_id"), Seq("user_id", "item_id"), "left_anti")
      .transform(TopK.perGroup(_, Seq("user_id"), "cnt", Seq("item_id"), k))
      .select("user_id", "item_id", "cnt", "rank")
  }

  def transitions(ratings: DataFrame, minCount: Long, k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "markov: positive minCount and k")
    ratings.select("user_id", "item_id", "ts")
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts"), col("item_id")))).as("evs"))
      .filter(size(col("evs")) > 1)
      .select(explode(expr(
        "zip_with(slice(evs, 1, size(evs) - 1), slice(evs, 2, size(evs) - 1)," +
          " (a, b) -> struct(a.item_id AS prev, b.item_id AS nxt))")).as("p"))
      .select(col("p.prev").as("prev"), col("p.nxt").as("nxt"))
      .filter(col("prev") =!= col("nxt"))
      .groupBy("prev", "nxt").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .transform(TopK.perGroup(_, Seq("prev"), "cnt", Seq("nxt"), k))
  }
}
