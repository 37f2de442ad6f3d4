package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train→eval contamination check — the decontamination gate of an LLM
  * data pipeline: an eval document whose k-gram shingles mostly appear
  * somewhere in the training corpus is leaked, and its benchmark score
  * is memorization, not generalization. The standard detector is n-gram
  * CONTAINMENT (asymmetric, unlike Jaccard):
  *
  *   containment(e) = |S_k(e) ∩ ⋃_train S_k(t)| / |S_k(e)|
  *
  * Scale shape: the train side collapses to its DISTINCT shingle set —
  * one partial-aggregated shuffle keyed by shingle, after which corpus
  * size no longer matters, only vocabulary size. The eval side
  * left-semi-joins that set on the same key (co-partitioned, no row
  * explosion — semi join emits each eval shingle at most once), then two
  * skinny per-doc counts. Nothing wide ever moves: the text stays in
  * place, only (doc_id, shingle) pairs shuffle.
  */
object Contamination {

  /** Per-eval-doc containment against the train corpus.
    * Output: (doc_id, n_shingles, n_hit, containment), one row per eval
    * doc that has ≥1 shingle (docs shorter than k tokens have no
    * containment evidence and are omitted, matching [[Dedup.shingles]]).
    */
  def containment(train: DataFrame, eval: DataFrame, k: Int,
                  textCol: String = "text"): DataFrame = {
    val trainSh = Dedup.shingles(train, k, textCol).select("s").distinct()
    val evalSh = Dedup.shingles(eval, k, textCol)
    val cnt = evalSh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
    val hit = evalSh.join(trainSh, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    cnt.join(hit, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_hit"))
      .select(col("doc_id"), col("n_shingles"), col("n_hit"),
        round(col("n_hit") * 1.0 / col("n_shingles"), 6).as("containment"))
  }
}
