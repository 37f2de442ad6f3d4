package graft.text

import graft.util.Sketches
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection with importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling"): score every document by the log-likelihood ratio of a
  * TARGET distribution vs the SOURCE (full-corpus) distribution, both
  * estimated over HASHED n-gram buckets — the trick that makes the
  * estimator O(nBuckets) instead of O(|vocab|), so it holds at 100 TB
  * where the raw vocabulary is billions of strings.
  *
  * score(doc) = Σ_b c_doc(b) · [ln p̂_tgt(b) − ln p̂_src(b)] with
  * Laplace-smoothed bucket models p̂(b) = (c(b)+1)/(N+B). The per-bucket
  * log-ratio is rounded ONCE to e6 integers (a deterministic scalar per
  * bucket), so the per-document score is an exact integer sum — no
  * float accumulation order to pin across engines or partitionings.
  *
  * Scale shape: one narrow token explode; TWO bucket-keyed hash
  * aggregations (map-side combined — at most B=2^k groups survive each
  * partition regardless of corpus size); the weight table is ≤ B rows,
  * broadcast into the doc-bucket stream; one final doc-keyed
  * aggregation. The corpus is never shuffled by raw token, only by
  * (doc_id, bucket) — bounded fan-in everywhere.
  */
object Dsir {

  /** Per-document hashed-unigram bucket counts: (doc_id, bkt, c).
    * Buckets are pmod(h52(word|seed), nBuckets) — the house md5 scheme,
    * rebuilt identically by any engine. */
  private[text] def docBuckets(docs: DataFrame, nBuckets: Int, seed: Long,
                               textCol: String, idCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col("doc_id"),
        pmod(Sketches.h52(seed, Seq(col("w"))), lit(nBuckets.toLong)).as("bkt"))
      .groupBy("doc_id", "bkt").agg(count(lit(1)).as("c"))

  /** Importance scores: (doc_id, n_tokens, score_e6). `isTarget` is a
    * deterministic predicate over the doc row (e.g. col("lang") ===
    * "en", or membership in a curated seed set joined on beforehand)
    * selecting the distribution to steer toward. Positive score_e6 →
    * the document looks more like the target than the corpus. */
  def importanceScores(docs: DataFrame, isTarget: Column,
                       nBuckets: Int = 1024, seed: Long = 42L,
                       textCol: String = "text",
                       idCol: String = "doc_id"): DataFrame = {
    require(nBuckets > 0, "dsir: nBuckets > 0")
    val b = nBuckets.toDouble
    val tagged = docs.withColumn("__tgt", isTarget)
    val db = docBuckets(tagged, nBuckets, seed, textCol, idCol)
    val tgtIds = tagged.filter(col("__tgt")).select(col(idCol).as("doc_id"))
    val src = db.groupBy("bkt").agg(sum("c").as("sc"))
    val tgt = db.join(tgtIds, Seq("doc_id"))
      .groupBy("bkt").agg(sum("c").as("tc"))
    val totals = src.agg(sum("sc").cast("double").as("S"))
      .crossJoin(tgt.agg(coalesce(sum("tc"), lit(0L)).cast("double").as("T")))
    // ≤ nBuckets rows: the broadcastable model
    val weights = src.join(tgt, Seq("bkt"), "left")
      .crossJoin(broadcast(totals))
      .select(col("bkt"),
        round((log((coalesce(col("tc"), lit(0L)) + lit(1.0)) / (col("T") + lit(b)))
          - log((col("sc") + lit(1.0)) / (col("S") + lit(b)))) * lit(1e6), 0)
          .cast("long").as("w_e6"))
    db.join(broadcast(weights), Seq("bkt"))
      .groupBy("doc_id")
      .agg(sum("c").as("n_tokens"),
        sum(col("c") * col("w_e6")).as("score_e6"))
  }
}
