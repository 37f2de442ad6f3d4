package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics keyword scoring for training-data pipelines: BM25
  * term weights against whole-corpus document frequencies, emitted as the
  * top-k keywords per document. The usual roles at 100 TB: content-based
  * doc routing, topic-balanced sampling keys, and cheap retrieval-style
  * relevance labels — all needing exactly this (tf, df, dl) triple.
  *
  * Scale shape: the token stream is shuffled ONCE — the (doc, term)
  * partial-aggregated groupBy. Everything downstream operates on the
  * fixed-width tf table: df is a skinny agg over tf (map-side combined),
  * doc length is a skinny agg over tf, and the idf/len joins shuffle only
  * tf-sized rows keyed by term / doc. Corpus scalars (N, avgdl) are a
  * one-row aggregate collected to the driver and inlined as literals —
  * never a cross join.
  */
object Keywords {

  /** Top-`k` BM25-weighted terms per document.
    *
    * score(t, d) = ln(1 + (N − df + 0.5)/(df + 0.5)) ·
    *               tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * N counts documents with ≥1 token; ties break on term ascending.
    * Output: (doc_id, term, tf, df, score, rank), rank ≤ k.
    */
  def bm25Keywords(docs: DataFrame, k: Int, k1: Double = 1.2, b: Double = 0.75,
                   textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dl = tf.groupBy("doc_id").agg(sum("tf").as("dl"))
    // corpus scalars from EXACT integer aggregates (collected once, inlined
    // as literals): dl/avgdl is expressed as dl·N/totTokens so every float
    // op consumes integer-exact operands — bit-identical across engines,
    // unlike a float avg() whose summation order is engine-defined
    val statsRow = dl.agg(count(lit(1)).as("n"), sum("dl").as("tot")).head()
    // empty corpus: sum("dl") is NULL — return the output schema, no
    // rows; doc_id keeps the INPUT's type so both branches union cleanly
    if (statsRow.getLong(0) == 0L)
      return tf.sparkSession.emptyDataFrame.select(
        lit(null).cast(docs.schema("doc_id").dataType).as("doc_id"),
        lit("").as("term"), lit(0L).as("tf"),
        lit(0L).as("df"), lit(0.0).as("score"), lit(0).as("rank"))
    val nDocs = statsRow.getLong(0).toDouble
    val totTok = statsRow.getLong(1).toDouble
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5))
    val norm = col("tf") * (k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") * nDocs / totTok))
    tf.join(df, "term")
      .join(dl, "doc_id")
      .withColumn("score", idf * norm)
      .withColumn("rank", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"), col("rank"))
  }
}
