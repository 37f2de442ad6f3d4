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

  /** TF-IDF cosine RETRIEVAL (the lexical ranker beside q130's
    * inverted index and [[bm25Keywords]]'s extraction): top-k documents
    * per keyword query under sklearn's smooth-idf weighting,
    * idf(t) = ln((N+1)/(df_t+1)) + 1.
    *
    * Determinism contract: idf is rounded ONCE per term to e3 integers
    * (a deterministic scalar — the DSIR weight discipline), so every
    * tf·idf weight, dot product, and squared norm is an EXACT integer
    * sum; the cosine is one float expression over identical integer
    * operands (num / (√nd · √nq), exact op order) rounded to 6, and
    * ranking orders by the ROUNDED value with doc_id ties — no
    * engine-defined float summation anywhere. Query terms absent from
    * the corpus carry no idf and drop out (both engines alike).
    *
    * Scale shape: tf/df are the bm25 aggregations (map-side combined,
    * bounded keys); the query side is a literal — the score join is
    * |query terms| × posting lists, the inverted-index access pattern,
    * never a corpus scan per query; the top-k window partitions by
    * query id over candidate rows only.
    *
    * @return (qid, doc_id, cosine) — top k per query */
  def tfidfRetrieve(docs: DataFrame, queries: Seq[(String, String)], k: Int,
                    textCol: String = "text"): DataFrame = {
    require(k >= 1 && queries.nonEmpty, "tfidfRetrieve: k >= 1, queries nonempty")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select(col("doc_id"), explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val n = docs.count()
    val idf = tf.groupBy("term").agg(count(lit(1)).as("df"))
      .withColumn("idf_e3",
        round((log((lit(n.toDouble) + lit(1.0)) / (col("df").cast("double") + lit(1.0)))
          + lit(1.0)) * lit(1e3), 0).cast("long"))
      .select("term", "idf_e3")
    val dv = tf.join(idf, Seq("term"))
      .select(col("doc_id"), col("term"), (col("tf") * col("idf_e3")).as("w"))
    val dn = dv.groupBy("doc_id").agg(sum(col("w") * col("w")).as("nd"))
    val qt = queries.toDF("qid", "qtext")
      .select(col("qid"), explode(split(lower(col("qtext")), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("qid", "term").agg(count(lit(1)).as("tfq"))
    val qv = qt.join(idf, Seq("term"))
      .select(col("qid"), col("term"), (col("tfq") * col("idf_e3")).as("wq"))
    val qn = qv.groupBy("qid").agg(sum(col("wq") * col("wq")).as("nq"))
    import org.apache.spark.sql.expressions.Window
    qv.join(dv, Seq("term"))
      .groupBy("qid", "doc_id").agg(sum(col("wq") * col("w")).as("num"))
      .join(dn, Seq("doc_id")).join(broadcast(qn), Seq("qid"))
      .withColumn("cosine", round(col("num").cast("double") /
        (sqrt(col("nd").cast("double")) * sqrt(col("nq").cast("double"))), 6))
      .withColumn("rk", row_number().over(
        Window.partitionBy("qid").orderBy(col("cosine").desc, col("doc_id").asc)))
      .filter(col("rk") <= k)
      .select("qid", "doc_id", "cosine")
  }
}
