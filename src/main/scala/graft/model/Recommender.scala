package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's model contract
  * (`framework/recommender/recommender.py:11-31`): train on the graph,
  * emit top-k recommendations per user. Re-expressed relationally:
  * train consumes the training rating edges (+ optional property
  * edges), recommend emits (user_id, item_id, rank).
  *
  * The reference's extension point is a name->class registry resolved
  * with importlib (`framework/recommender/model2class.py:1-42`); here
  * it is [[Recommenders.registry]], a name -> factory map.
  */
trait Recommender {
  def name: String

  /** Fit on training edges; returns a fitted instance (may be `this`).
    *
    * `propertyEdges`: (src_label, relation, dst_label) User/Item→Property
    * edges — part of the KG triples export (graph.py:79-109).
    * `socialEdges`: (src_label, relation, dst_label) User–User edges
    * (graph.py:304-314) — they enter the WALK graph but are excluded
    * from `get_all_triples`, so KGE models must ignore them. */
  def train(spark: SparkSession, trainRatings: DataFrame,
            propertyEdges: Option[DataFrame] = None,
            socialEdges: Option[DataFrame] = None): Recommender

  /** Top-k per user: (user_id, item_id, rank), rank 1-based, never
    * recommending an item the user already rated in train (the J5
    * anti-join, deep_walk_based/model.py:69-77). */
  def recommend(k: Int): DataFrame

  /** Single-user recommendation (`get_user_recommendation`,
    * recommender.py:30-31; deep_walk_based/model.py:84-103): the
    * per-user slice of [[recommend]]. This default filters the full
    * ranking — fine for fully relational models, where Catalyst pushes
    * the user_id filter below the ranking window. Models whose scoring
    * kernel is an opaque RDD (the embedding recommenders) override it to
    * filter the query side BEFORE the kernel, so a single-user call
    * scores one row instead of every user. */
  def recommendUser(user: String, k: Int): DataFrame =
    recommend(k).filter(org.apache.spark.sql.functions.col("user_id") ===
      org.apache.spark.sql.functions.lit(user))

  /** Release any persisted training state (embedding tables, vocab
    * caches). Called by the Experiment loop after a fold's metrics are
    * final — per-fold models otherwise accumulate storage for the whole
    * session. Safe to call more than once; default is a no-op. */
  def release(): Unit = ()
}

object Recommenders {
  /** name -> factory, mirroring model2class.py. Config is a flat
    * string map (the YAML `parameters` block). */
  def registry: Map[String, Map[String, String] => Recommender] = Map(
    "popularity" -> (cfg => new PopularityRecommender(cfg)),
    "bpr" -> (cfg => new BprRecommender(cfg)),
    "als" -> (cfg => new AlsRecommender(cfg)),
    "als_implicit" -> (cfg => new AlsImplicitRecommender(cfg)),
    "item2vec" -> (cfg => new Item2VecRecommender(cfg))
  ) ++ graft.walk.DeepWalkRecommender.registry ++ graft.kge.KgeRecommender.registry
}
