package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation / phrase detection by integer lift — the word2vec
  * phrase-merging score (Mikolov et al. 2013, eq. 6:
  * `(count(ab) − δ) / (count(a)·count(b)) · N`) used to promote
  * "new york"-style bigrams to single tokens before embedding
  * training, here in exact scaled-integer form so the scores replay
  * bit-for-bit: `lift_e4 = (cooc − δ)·N·10⁴ div (cnt_a·cnt_b)` with
  * every factor a BIGINT count. The discount δ kills rare-pair noise;
  * `minCount > δ` is required so the numerator stays nonnegative
  * (floor-div crosses engines only for nonnegative values).
  *
  * Tokenization matches the repo's token-stream queries (q19/q117):
  * lowercase, split on single space, empty tokens dropped.
  *
  * Scale anatomy:
  *   - The bigram build is NARROW — adjacent pairs come from a
  *     within-row `transform(sequence(...))` over the token array,
  *     not the posexplode + self-join-on-(doc, pos+1) shape that
  *     shuffles the exploded corpus twice.
  *   - Both count tables collapse under map-side combine: unigrams
  *     to vocabulary size, bigrams to observed-pair size, pruned by
  *     `minCount` before any join.
  *   - The unigram table is eagerly localCheckpoint'ed (it is
  *     referenced three times: two count joins + the corpus-size
  *     sum) and joined back with a size-gated broadcast
  *     (`broadcastMaxVocab`); above the gate the joins shuffle
  *     vocab-sized tables, never the corpus.
  *   - N rides as a single-row broadcast cross-join — no driver
  *     collect.
  *   - Overflow bound: `(cooc−δ)·N·10⁴ < 2⁶³` ⇒ cooc·N < 9.2·10¹⁴
  *     — at web scale shard the corpus or drop the 10⁴ scale; the
  *     prune order (HAVING before joins) is unaffected.
  */
object Collocations {

  /** Returns (a, b, cooc, lift_e4) for every adjacent token pair
    * with `cooc >= minCount`. */
  def phrases(docs: DataFrame, textCol: String, minCount: Long, delta: Long,
              broadcastMaxVocab: Long = 1000000L): DataFrame = {
    require(minCount > delta,
      "collocations: minCount must exceed delta (keeps the discounted numerator nonnegative)")
    val ws = docs.select(
      filter(split(lower(col(textCol)), " "), w => length(w) > 0).as("ws"))
    val uni = ws.select(explode(col("ws")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val vocab = uni.count()
    def gate(df: DataFrame) = if (vocab <= broadcastMaxVocab) broadcast(df) else df
    val bi = ws.filter(size(col("ws")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(ws) - 2), i -> named_struct('a', ws[i], 'b', ws[i + 1]))")).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cooc"))
      .filter(col("cooc") >= minCount)
    bi.join(gate(uni.select(col("t").as("a"), col("cnt").as("__ca"))), "a")
      .join(gate(uni.select(col("t").as("b"), col("cnt").as("__cb"))), "b")
      .crossJoin(broadcast(uni.agg(sum("cnt").as("__N"))))
      .select(col("a"), col("b"), col("cooc"),
        expr(s"(cooc - ${delta}L) * __N * 10000L div (__ca * __cb)").as("lift_e4"))
  }
}
