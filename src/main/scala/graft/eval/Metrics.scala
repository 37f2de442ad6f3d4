package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MAP@k and nDCG@k as distributed DataFrame aggregations, mirroring
  * `framework/evaluator/metrics/map.py` and `ndcg.py` plus the shared
  * relevance filter of `framework/evaluator/metric.py:19-36`.
  *
  * Inputs:
  *  - recs: (user_id, item_id, rank) with rank 1-based, unique per user
  *  - test: (user_id, item_id, rating)
  *
  * Reference semantics preserved:
  *  - only test items with rating >= relevanceThreshold are relevant
  *    (metric.py:25-31);
  *  - users with zero relevant test items are dropped from the mean
  *    (metric.py:33-34);
  *  - recommendations are truncated to the first k (map.py:19-20);
  *  - AP denominator is min(|relevant|, k) (map.py:32);
  *  - DCG uses graded relevance rel/log2(pos+2) with 0-based pos
  *    (ndcg.py:21-28); IDCG is the relevant ratings sorted descending,
  *    truncated to k (ndcg.py:40-44); nDCG = 0 when IDCG = 0
  *    (ndcg.py:45-46 — unreachable here because relevant users have at
  *    least one positive-rated item).
  *
  * Shuffle shape: one join of recs against the (much smaller) relevant
  * set on (user_id, item_id), then per-user windows — all partitioned by
  * user_id, so the whole metric pipeline is a single exchange.
  */
object Metrics {

  /** Test items at/above the relevance threshold (metric.py:25-31). */
  def relevant(test: DataFrame, relevanceThreshold: Double): DataFrame =
    test.filter(col("rating") >= relevanceThreshold)
      .select("user_id", "item_id", "rating")

  /** Per-user average precision at k -> (user_id, ap). */
  def apPerUser(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame = {
    val rel = relevant(test, relevanceThreshold)
    val nrel = rel.groupBy("user_id").agg(count(lit(1)).as("nrel"))
    // a duplicate recommendation still consumes its position but is not
    // re-counted as a hit (map.py:29: `rec not in recommendations[:i]`)
    val occ = Window.partitionBy("user_id", "item_id").orderBy("rank")
    val hits = recs.filter(col("rank") <= k)
      .join(nrel, Seq("user_id")) // inner: drops users with no relevant items
      .join(rel.select(col("user_id"), col("item_id"), lit(1).as("hit")),
        Seq("user_id", "item_id"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0)))
      .withColumn("hit", when(row_number().over(occ) === 1, col("hit")).otherwise(0))
    val w = Window.partitionBy("user_id").orderBy("rank")
    hits
      .withColumn("cum_hits", sum("hit").over(w))
      .groupBy("user_id", "nrel")
      .agg(sum(col("hit") * col("cum_hits") / col("rank").cast("double")).as("ap_sum"))
      .select(col("user_id"),
        (col("ap_sum") / least(col("nrel"), lit(k)).cast("double")).as("ap"))
  }

  /** Per-user nDCG at k -> (user_id, ndcg). */
  def ndcgPerUser(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame = {
    val rel = relevant(test, relevanceThreshold)
    // IDCG: relevant ratings per user, sorted desc, truncated to k (ndcg.py:40-44)
    val iw = Window.partitionBy("user_id").orderBy(col("rating").desc, col("item_id"))
    val idcg = rel
      .withColumn("pos", row_number().over(iw))
      .filter(col("pos") <= k)
      .groupBy("user_id")
      .agg(sum(col("rating") / log2(col("pos").cast("double") + 1.0)).as("idcg"))
    // DCG: graded relevance of each recommended item, 0 when not relevant (ndcg.py:28-38)
    recs.filter(col("rank") <= k)
      .join(idcg, Seq("user_id")) // inner: only users with >= 1 relevant item
      .join(rel.withColumnRenamed("rating", "rel_rating"),
        Seq("user_id", "item_id"), "left")
      .withColumn("rel_rating", coalesce(col("rel_rating"), lit(0.0)))
      .groupBy("user_id", "idcg")
      .agg(sum(col("rel_rating") / log2(col("rank").cast("double") + 1.0)).as("dcg"))
      .select(col("user_id"),
        when(col("idcg") > 0.0, col("dcg") / col("idcg")).otherwise(0.0).as("ndcg"))
  }

  /** Serendipity@k (Ge et al. 2010, simplified to the standard
    * primitive-baseline form): the share of a user's top-k that is
    * both RELEVANT (a positive test item) and UNEXPECTED (absent from
    * a primitive baseline's top-k — canonically the popularity
    * recommender, which is exactly what "obvious" means in a
    * recommender). Exact integers: ser_e6 = n_serendip·10⁶ div k.
    * Users qualify by the [[apPerUser]] rule (≥ 1 relevant test item
    * and present in `recs`). One exchange keyed by (user, item) for
    * the two left joins + one user-keyed aggregation. */
  def serendipityAtK(recs: DataFrame, primitive: DataFrame, test: DataFrame,
                     k: Int, relevanceThreshold: Double): DataFrame = {
    val rel = relevant(test, relevanceThreshold)
    val qualified = rel.select("user_id").distinct()
    // "expected" = the baseline's top-k: cut here when the frame still
    // carries a rank column; a rank-less frame must already BE a top-k
    // list (the pre-cut contract) or the metric silently loosens
    val prim =
      if (primitive.columns.contains("rank")) primitive.filter(col("rank") <= k)
      else primitive
    recs.filter(col("rank") <= k)
      .join(qualified, Seq("user_id")) // inner: qualifying users only
      .join(prim.select(col("user_id"), col("item_id"), lit(1).as("in_prim")),
        Seq("user_id", "item_id"), "left")
      .join(rel.select(col("user_id"), col("item_id"), lit(1).as("hit")),
        Seq("user_id", "item_id"), "left")
      .groupBy("user_id")
      .agg(sum(when(col("in_prim").isNull && col("hit") === 1, 1L)
        .otherwise(0L)).as("n_serendip"))
      .select(col("user_id"), col("n_serendip"),
        expr(s"n_serendip * 1000000L div $k").as("ser_e6"))
  }

  /** MAP@k: mean of per-user AP over qualifying users (map.py:15-16). */
  def mapAtK(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame =
    apPerUser(recs, test, k, relevanceThreshold).agg(avg("ap").as("map"))

  /** Mean nDCG@k over qualifying users (ndcg.py:13-19). */
  def ndcgAtK(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame =
    ndcgPerUser(recs, test, k, relevanceThreshold).agg(avg("ndcg").as("ndcg"))

  /** MAP@k AND nDCG@k in ONE pass — both means ride a single join tree
    * and one exchange over the (cached) recommendations, instead of the
    * two separate jobs the sequential metric loop costs. Returns one row
    * (map, ndcg). Value-identical to [[mapAtK]]/[[ndcgAtK]] (spec-pinned):
    * the AP hit dedup (first occurrence by rank) and the un-deduped DCG
    * graded relevance both match their standalone formulations. */
  def meansAtK(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame =
    perUserAtK(recs, test, k, relevanceThreshold)
      .agg(avg("ap").as("map"), avg("ndcg").as("ndcg"))

  /** Per-user AP@k AND nDCG@k in ONE pass → (user_id, ap, ndcg) — the
    * [[meansAtK]] body before its final mean. Value-identical to
    * [[apPerUser]] ⋈ [[ndcgPerUser]] (both restrict to users with ≥ 1
    * relevant test item that received recommendations) but consumes
    * `recs` ONCE — composed experiments (q142) feed an expensive
    * trained-model subtree here, and Spark does not reuse exchanges
    * across two independently-built metric trees. */
  def perUserAtK(recs: DataFrame, test: DataFrame, k: Int, relevanceThreshold: Double): DataFrame = {
    val rel = relevant(test, relevanceThreshold)
    val nrel = rel.groupBy("user_id").agg(count(lit(1)).as("nrel"))
    val iw = Window.partitionBy("user_id").orderBy(col("rating").desc, col("item_id"))
    val idcg = rel.withColumn("pos", row_number().over(iw))
      .filter(col("pos") <= k)
      .groupBy("user_id")
      .agg(sum(col("rating") / log2(col("pos").cast("double") + 1.0)).as("idcg"))
    val occ = Window.partitionBy("user_id", "item_id").orderBy("rank")
    val w = Window.partitionBy("user_id").orderBy("rank")
    recs.filter(col("rank") <= k)
      .join(nrel.join(idcg, Seq("user_id")), Seq("user_id")) // inner: qualifying users only
      .join(rel.select(col("user_id"), col("item_id"), lit(1).as("hit"),
        col("rating").as("rel_rating")), Seq("user_id", "item_id"), "left")
      .withColumn("hit", coalesce(col("hit"), lit(0)))
      .withColumn("hit", when(row_number().over(occ) === 1, col("hit")).otherwise(0))
      .withColumn("rel_rating", coalesce(col("rel_rating"), lit(0.0)))
      .withColumn("cum_hits", sum("hit").over(w))
      .groupBy("user_id", "nrel", "idcg")
      .agg(sum(col("hit") * col("cum_hits") / col("rank").cast("double")).as("ap_sum"),
        sum(col("rel_rating") / log2(col("rank").cast("double") + 1.0)).as("dcg"))
      .select(col("user_id"),
        (col("ap_sum") / least(col("nrel"), lit(k)).cast("double")).as("ap"),
        when(col("idcg") > 0.0, col("dcg") / col("idcg")).otherwise(0.0).as("ndcg"))
  }
}
