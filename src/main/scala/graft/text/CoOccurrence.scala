package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed co-occurrence counting — the skip-gram context matrix
  * (word2vec's training distribution, GloVe's input statistic):
  * every ordered token pair within `window` positions counts once,
  * tagged with its offset. [[Collocations]] is the `window = 1` slice
  * with lift scoring; this is the general matrix an embedding or
  * PMI pipeline consumes.
  *
  * Scale anatomy: pair generation is NARROW — for each offset
  * `d ∈ 1..window` a within-row zip of the token array against its
  * d-shifted self (`transform(sequence(...))` — no posexplode
  * self-join, the corpus is never shuffled before aggregation), and
  * the only exchange is the final map-side-combined
  * (left, right, offset) count, which collapses to observed-pair ×
  * window size. Output is pruned by `minCount` before it leaves the
  * aggregation.
  */
object CoOccurrence {

  /** Returns (left, right, offset, n): `right` appeared `offset`
    * positions after `left` exactly `n ≥ minCount` times.
    * Tokenization matches the repo's token-stream queries
    * (lowercase, single-space split, empties dropped). */
  def matrix(docs: DataFrame, textCol: String, window: Int,
             minCount: Long = 1L): DataFrame = {
    require(window >= 1, "coOccurrence: window >= 1")
    // inner sequence is always ascending (i+1 <= least(i+window,
    // size-1) for i <= size-2) — Spark's sequence() DESCENDS when
    // stop < start, so a per-offset "sequence(0, size-1-d)" form
    // would silently emit negative indices on short docs
    val pairs =
      s"""flatten(transform(sequence(0, size(ws) - 2),
         |  i -> transform(sequence(i + 1, least(i + $window, size(ws) - 1)),
         |    j -> named_struct('left', ws[i], 'right', ws[j], 'offset', j - i))))""".stripMargin
    docs
      .select(filter(split(lower(col(textCol)), " "), w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) > 1)
      .select(explode(expr(pairs)).as("p"))
      .select(col("p.left").as("left"), col("p.right").as("right"),
        col("p.offset").as("offset"))
      .groupBy("left", "right", "offset").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
  }
}
