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

  /** Pointwise mutual information over the offset-AGGREGATED window
    * matrix — the association score an embedding-adjacent pipeline
    * reads off the co-occurrence counts (Church & Hanks 1990; the
    * word2vec SGNS objective factorizes shifted PMI, Levy & Goldberg
    * 2014): `pmi = log2(c(l,r)·N / (c(l)·c(r)))` with N the total
    * token count and unigrams over the same filtered stream. Log is
    * the q12 rounded-double precedent (round 6); the exact-integer
    * sibling is [[Collocations]]' lift. `minCount` prunes the
    * aggregated directed pair count BEFORE the unigram joins. Same
    * narrow pair generation as [[matrix]]; two extra broadcast-or-
    * shuffle equi-joins against the skinny unigram rollup.
    *
    * @return (left, right, n, pmi) for directed pairs within `window` */
  def pmi(docs: DataFrame, textCol: String, window: Int,
          minCount: Long): DataFrame = {
    val toks = docs
      .select(filter(split(lower(col(textCol)), " "), w => length(w) > 0).as("ws"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val total = uni.agg(sum("c").cast("double").as("nn"))
    matrix(docs, textCol, window, 1L)
      .groupBy("left", "right").agg(sum("n").as("n"))
      .filter(col("n") >= minCount)
      .join(uni.select(col("w").as("left"), col("c").as("cl")), Seq("left"))
      .join(uni.select(col("w").as("right"), col("c").as("cr")), Seq("right"))
      .crossJoin(broadcast(total))
      .select(col("left"), col("right"), col("n"),
        round(log2(col("n").cast("double") * col("nn")
          / (col("cl").cast("double") * col("cr").cast("double"))), 6).as("pmi"))
  }
}
