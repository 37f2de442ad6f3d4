package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Non-personalized baseline: recommend the globally most-rated items
  * the user has not yet rated. Not present in the reference model zoo,
  * but exercises its whole recommendation spine (SURVEY §7 step 4):
  * candidate generation bounded by max_user_rated + k — the reference's
  * n_neighbors bound (`deep_walk_based/model.py:137-149`) — anti-join
  * against train ratings (J5) and per-user top-k window (W7).
  *
  * Scale shape: popularity is one partial-aggregated groupBy; the
  * candidate set is tiny (max_user_degree + k rows) and broadcast, so
  * the "cross join" is a broadcast nested loop over users — no shuffle
  * of the big side; the anti-join shuffles on (user_id, item_id) which
  * AQE can plan as broadcast when train fits.
  */
class PopularityRecommender(cfg: Map[String, String] = Map.empty) extends Recommender {
  override def name: String = "popularity"

  private var train: DataFrame = _

  override def train(spark: SparkSession, trainRatings: DataFrame,
                     propertyEdges: Option[DataFrame],
                     socialEdges: Option[DataFrame]): Recommender = {
    this.train = trainRatings
    this
  }

  override def recommend(k: Int): DataFrame =
    PopularityRecommender.recommend(train, k, allRecs = cfg.get("all_recs").contains("true"))

  override def release(): Unit =
    if (train != null) train.unpersist(blocking = false)
}

object PopularityRecommender {
  /** (user_id, item_id, rank) of the top-k most popular unrated items.
    * `allRecs`: rank every unrated item (no candidate bound, no cutoff) —
    * deep_walk_based/model.py:75-86's all_recs mode. */
  def recommend(trainRaw: DataFrame, k: Int, allRecs: Boolean = false): DataFrame = {
    // train is read three times (popularity, degree bound, anti-join):
    // materialize once instead of re-deriving the upstream join+agg
    val train = trainRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pop = train.groupBy("item_id").agg(count(lit(1)).as("cnt"))
    // max #items any single user rated — bounds candidates exactly like
    // the reference bounds kNN n_neighbors (deep_walk_based/model.py:137-149)
    val maxRated = train.groupBy("user_id").agg(count(lit(1)).as("c"))
      .agg(max("c")).first().getLong(0)
    // orderBy+limit plans as TakeOrderedAndProject (parallel partial
    // top-N per partition), not the single-task unpartitioned
    // row_number window it replaces — same rows, same order semantics
    val cand = if (allRecs) pop else pop
      .orderBy(col("cnt").desc, col("item_id"))
      .limit(math.min(maxRated + k, Int.MaxValue.toLong).toInt)
    val users = train.select("user_id").distinct()
    val ranked = users.crossJoin(broadcast(cand))
      .join(train.select("user_id", "item_id"), Seq("user_id", "item_id"), "left_anti")
      .withColumn("rank",
        row_number().over(Window.partitionBy("user_id").orderBy(col("cnt").desc, col("item_id"))))
    (if (allRecs) ranked else ranked.filter(col("rank") <= k))
      .select("user_id", "item_id", "rank")
  }
}
