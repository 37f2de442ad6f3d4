package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budgeted quality selection (FineWeb-edu-style corpus
  * assembly): per source, admit documents in (quality DESC, doc_id)
  * order until the cumulative token count crosses the budget — a doc is
  * in iff the budget was not exhausted strictly BEFORE it.
  *
  * The naive plan is a running-sum window partitioned by `source` —
  * with a handful of sources, that forces billions of rows through a
  * single task's sort (the r9 scale-killer on q106). The decomposition
  * here splits the same exact prefix sum on the total order
  * (quality DESC, doc_id) into three skinny levels, reusing the
  * [[SequencePack.pack]] two-level pattern twice:
  *
  *   1. per-(source, quality) token totals — one partial-aggregated
  *      skinny shuffle; `quality` is a round-6 double in [0,1], so this
  *      table is bounded at ~1e6 rows per source REGARDLESS of corpus
  *      size;
  *   2. `qbase` = exclusive cumsum of those totals over quality DESC
  *      within source — a window over the bounded skinny table only.
  *      Every quality group whose qbase already ≥ budget is pruned HERE:
  *      the corpus rows of rejected groups are dropped by a skinny
  *      semi-ish join and never reach any sort;
  *   3. within a surviving (source, quality) group the order is plain
  *      doc_id, which decomposes by a coarse `doc_id div docGroupWidth`
  *      key exactly like SequencePack: per-(source, quality, dg) totals,
  *      exclusive cumsum over dg (skinny), then a fully parallel
  *      within-dg cumsum where each window partition holds ≤
  *      docGroupWidth fixed-width rows.
  *
  * cum_tokens = qbase + dgbase + within-group prefix + own n_tokens —
  * exact long arithmetic, bit-identical to the naive window. The corpus
  * is scanned twice (once aggregated to the skinny level-1 table, once
  * joined against the pruned group list), but every shuffled row is
  * fixed-width and no task ever sorts more than docGroupWidth rows: at
  * 100 TB with 20 sources the naive plan sorts ~5 TB on one task, this
  * one tops out at ~16 MB per window partition.
  *
  * Quality mass points are the reason for level 3: `quality` saturates
  * at 1.0 for any long stopword-rich doc (see
  * [[graft.text.TextOps.qualityScore]]), so one quality value can hold
  * an unbounded share of the corpus — bucketing by quality alone would
  * recreate the monolithic sort inside the 1.0 bucket.
  */
object TokenBudget {

  /** `scored`: (doc_id: long, source, quality, n_tokens: long) — one row
    * per document, doc_id unique. Returns the admitted rows with their
    * exact running total: (doc_id, source, quality, n_tokens,
    * cum_tokens), equal to the naive per-source running-sum window's
    * output filtered to `cum_tokens - n_tokens < budget`. */
  def select(scored: DataFrame, budget: Long, docGroupWidth: Long = 1L << 20): DataFrame = {
    require(budget >= 0, s"budget must be >= 0, got $budget")
    require(docGroupWidth >= 1, s"docGroupWidth must be >= 1, got $docGroupWidth")
    val qBase = scored.groupBy("source", "quality")
      .agg(sum("n_tokens").as("qt"))
      .withColumn("qbase", coalesce(
        sum("qt").over(Window.partitionBy("source").orderBy(col("quality").desc)
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      // groups already past the budget can admit nothing — prune them
      // before their corpus rows touch any window
      .filter(col("qbase") < budget)
      .select("source", "quality", "qbase")
    val pruned = scored.join(qBase, Seq("source", "quality"))
      .withColumn("dg", expr(s"doc_id div $docGroupWidth"))
    val dgBase = pruned.groupBy("source", "quality", "dg")
      .agg(sum("n_tokens").as("dt"))
      .withColumn("dgbase", coalesce(
        sum("dt").over(Window.partitionBy("source", "quality").orderBy("dg")
          .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("source", "quality", "dg", "dgbase")
    pruned
      .withColumn("prev", coalesce(
        sum("n_tokens").over(
          Window.partitionBy("source", "quality", "dg").orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .join(dgBase, Seq("source", "quality", "dg"))
      .withColumn("cum_tokens", col("qbase") + col("dgbase") + col("prev") + col("n_tokens"))
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "source", "quality", "n_tokens", "cum_tokens")
  }
}
