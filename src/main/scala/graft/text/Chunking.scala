package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-window document chunking with overlap — the step between raw
  * corpus and context-window-sized training examples (split each doc
  * into `chunkLen`-char pieces every `stride` chars, the final piece
  * keeping the tail). Pure integer arithmetic end to end so a SQL
  * oracle replays it exactly: for L = length(text),
  *   nChunks = 1                              if L <= chunkLen
  *           = (L - chunkLen + stride - 1) / stride + 1   otherwise
  * and chunk i covers [i*stride, i*stride + chunkLen).
  *
  * Scale shape: `explode(sequence(...))` over a per-row integer bound —
  * a narrow generator, no shuffle, no driver involvement; output size
  * is ~L/stride rows per doc and each chunk substring is computed
  * inside codegen. At 100 TB the chunker is map-only and pipelines
  * straight into the downstream shuffle (pack/dedup/shard) without a
  * barrier of its own. */
object Chunking {

  /** @param keepCols passthrough columns (ids, provenance) copied onto
    *                 every chunk row */
  def chunk(docs: DataFrame, textCol: String, chunkLen: Int, stride: Int,
            keepCols: Seq[String]): DataFrame = {
    require(chunkLen > 0 && stride > 0 && stride <= chunkLen,
      s"chunk: need 0 < stride <= chunkLen (chunkLen=$chunkLen, stride=$stride)")
    val len = length(col(textCol))
    // `div` (not `/`): Column./ is double division in Spark SQL
    val n = when(len <= chunkLen, lit(1))
      .otherwise(expr(s"(length($textCol) - ${chunkLen - stride + 1}) div $stride + 1"))
      .cast("int")
    docs
      .select(keepCols.map(col) :+ col(textCol) :+ explode(sequence(lit(0), n - 1)).as("chunk_idx"): _*)
      .select(
        keepCols.map(col) :+
          col("chunk_idx") :+
          expr(s"substring($textCol, chunk_idx * $stride + 1, $chunkLen)").as("chunk_text"): _*)
      .withColumn("chunk_chars", length(col("chunk_text")))
  }
}
