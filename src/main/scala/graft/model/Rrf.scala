package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.TopK

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
  * hybrid-retrieval combiner: rankings from heterogeneous scorers
  * (neighborhood CF, popularity, embedding kNN, BM25 …) fuse on RANK
  * alone, `score(i) = Σ_r 1/(k + rank_r(i))`, which needs no score
  * calibration across systems. Computed in exact scaled integers
  * (`10⁶ div (k + rank)` per contribution, summed as BIGINTs), so
  * fused scores and the final ranking replay bit-for-bit — the
  * floating form cannot hash-match across engines.
  *
  * Scale shape: a union of skinny (user, item, rank) tables, one
  * map-side-combined sum per (user, item) — candidates per user are
  * bounded by Σ per-ranking top-k, so the group state is tiny — and
  * the final per-user top-k on the [[TopK]] bounded-heap combine
  * (no full-candidate window sort). Ties break by item id, total
  * order both engines share.
  */
object Rrf {

  /** Fuses rankings (each `(user_id, item_id, rank)`, rank 1-based)
    * into per-user top-`topK` rows `(user_id, item_id, rrf_e6,
    * rank)`. */
  def fuse(rankings: Seq[DataFrame], k: Long = 60L, topK: Int = 5): DataFrame = {
    require(rankings.nonEmpty, "rrf: at least one ranking")
    require(k >= 1, "rrf: k >= 1")
    val u = rankings
      .map(_.select(col("user_id"), col("item_id"), col("rank")))
      .reduce(_ unionByName _)
    val scored = u
      .select(col("user_id"), col("item_id"),
        expr(s"1000000L div (${k}L + rank)").as("__c"))
      .groupBy("user_id", "item_id").agg(sum("__c").as("rrf_e6"))
    TopK.perGroup(scored, Seq("user_id"), "rrf_e6", Seq("item_id"), topK)
  }
}
