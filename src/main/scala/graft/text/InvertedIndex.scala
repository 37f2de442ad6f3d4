package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded inverted-index construction — the IR primitive behind
  * corpus search and contamination lookup: term → posting list of
  * (doc_id, term frequency). The classic scale hazard is the hot
  * term ("the") whose posting list is corpus-sized: one group, one
  * task, one giant row. Sharding the posting space by
  * `doc_id div shardSize` bounds every output row at `shardSize`
  * postings — the layout real engines store (per-segment postings),
  * and the group key (term, shard) spreads hot terms across the
  * cluster instead of funneling them into one reducer.
  *
  * Physical plan: explode → map-side-combined (term, doc) tf count →
  * (term, shard) group assembling the posting string from a SORTED
  * struct array — per-group state is ≤ shardSize entries by
  * construction, so no unbounded collect_list ever exists.
  * Tokenization matches the repo's token-stream queries
  * (lowercase, single-space split, empties dropped).
  */
object InvertedIndex {

  /** Returns (term, shard, df, postings) where df counts the shard's
    * documents containing the term and postings is
    * "docid:tf,docid:tf,…" in ascending doc order. */
  def build(docs: DataFrame, idCol: String, textCol: String,
            shardSize: Long = 1024L): DataFrame = {
    require(shardSize >= 1, "invertedIndex: shardSize >= 1")
    docs
      .select(col(idCol).as("doc_id"),
        explode(filter(split(lower(col(textCol)), " "), w => length(w) > 0)).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .groupBy(col("term"), expr(s"doc_id div ${shardSize}L").as("shard"))
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
            p => concat(p("doc_id"), lit(":"), p("tf"))),
          ",").as("postings"))
  }
}
