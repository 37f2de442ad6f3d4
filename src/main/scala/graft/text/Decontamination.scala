package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination — the benchmark-leakage gate every
  * serious training-data pipeline runs (GPT-3 appendix C's 13-gram
  * filter; FineWeb's decontamination stage): a training document is
  * CONTAMINATED when it shares at least `minShared` distinct
  * word-k-grams with some single eval/benchmark document.
  *
  * Scale shape: distinct shingles on both sides
  * ([[Dedup.shingles]] — the q33/q16 machinery); the EVAL side is
  * structurally tiny (benchmarks are thousands of documents against a
  * 100 TB corpus), so its shingle set BROADCASTS and the train corpus
  * never shuffles — the join is a narrow broadcast hash probe, the
  * per-(train, eval) overlap count a map-side-combined aggregate over
  * only the matching grams. Never an all-pairs document comparison.
  */
object Decontamination {

  /** @return one row per contaminated train doc:
    *         (doc_id, n_eval_matches, max_shared) — how many eval docs
    *         it collides with and the largest shared-gram count */
  def flags(train: DataFrame, eval: DataFrame, k: Int,
            minShared: Long): DataFrame = {
    require(k >= 1 && minShared >= 1, "decontamination: positive k/minShared")
    val ts = Dedup.shingles(train, k)
    val es = Dedup.shingles(eval, k)
      .select(col("doc_id").as("eval_id"), col("s"))
    ts.join(broadcast(es), Seq("s"))
      // shingles are DISTINCT per doc on both sides, so count(1) is
      // the shared-distinct-gram count
      .groupBy("doc_id", "eval_id").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_eval_matches"), max("n_shared").as("max_shared"))
  }
}
