package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fixed-block sequence packing — the final layout step of an LLM
  * training-data pipeline: the corpus token stream, concatenated in
  * doc_id order, is cut into fixed `blockSize` training sequences, and
  * each document is assigned its (block, offset) coordinates. Documents
  * whose tokens straddle a block boundary are flagged (`spans_blocks`)
  * so a loader can decide to split or mask them.
  *
  * The core is a GLOBAL prefix sum, which naively is a single-partition
  * window — the classic scale killer. It decomposes exactly by a coarse
  * group key (doc_id div `groupWidth`):
  *
  *   1. per-doc token counts — narrow map, no shuffle;
  *   2. per-group totals — one partial-aggregated skinny shuffle;
  *   3. cumsum over GROUP TOTALS — a window over |docs|/groupWidth rows
  *      (thousands, not billions): negligible even single-task;
  *   4. within-group cumsum — windows partitioned by group, fully
  *      parallel, each partition holding ≤ groupWidth fixed-width rows;
  *   5. start offset = group base + within-group prefix, via a broadcast
  *      join of the tiny group-base table.
  *
  * Every shuffled row is fixed-width (ids + counts); the text itself
  * never moves. At 100 TB with groupWidth 2^20 a trillion-doc corpus
  * yields a ~1M-row group table — still driver-safe.
  */
object SequencePack {

  /** Assign each document its packed-block coordinates.
    * Output: (doc_id, n_tokens, start_off, block_id, block_off,
    * spans_blocks). Tokens are nonempty whitespace splits of
    * lower(textCol); zero-token documents occupy no span and never span
    * blocks.
    */
  def pack(docs: DataFrame, blockSize: Int, groupWidth: Long = 1L << 20,
           textCol: String = "text"): DataFrame = {
    require(blockSize >= 1, s"blockSize must be >= 1, got $blockSize")
    require(groupWidth >= 1, s"groupWidth must be >= 1, got $groupWidth")
    val cnt = docs.select(col("doc_id"),
      size(filter(split(lower(col(textCol)), " "), t => t =!= "")).cast("bigint").as("n_tokens"))
    val grp = cnt.withColumn("g", expr(s"doc_id div $groupWidth"))
    val gBase = grp.groupBy("g").agg(sum("n_tokens").as("gt"))
      .withColumn("gbase", coalesce(
        sum("gt").over(Window.orderBy("g").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select("g", "gbase")
    val within = grp.withColumn("prev", coalesce(
      sum("n_tokens").over(
        Window.partitionBy("g").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)))
    within.join(broadcast(gBase), "g")
      .withColumn("start_off", col("gbase") + col("prev"))
      .withColumn("block_id", expr(s"start_off div $blockSize"))
      .withColumn("block_off", col("start_off") % blockSize)
      // last occupied position; greatest(n,1) keeps empty docs point-like
      .withColumn("spans_blocks",
        expr(s"(start_off + greatest(n_tokens, 1) - 1) div $blockSize") =!= col("block_id"))
      .select("doc_id", "n_tokens", "start_off", "block_id", "block_off", "spans_blocks")
  }
}
