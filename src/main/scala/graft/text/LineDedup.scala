package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** C4-style line-level corpus deduplication: a line is kept only in the
  * document where it FIRST occurs (C4 kept one occurrence of every
  * three-sentence span; The Pile / RefinedWeb apply the same rule to
  * lines). First occurrence is defined by the total order
  * (doc_id, line_idx) — deterministic and partition-invariant, unlike
  * "first seen" under distributed ingest.
  *
  * Scale shape: one exchange keyed by line content (the window that
  * ranks occurrences — pure shuffle + sort, no driver state), one
  * exchange keyed by doc_id (the reassembly groupBy). Line content is
  * the natural dedup key at 100 TB: hot lines (boilerplate headers,
  * cookie banners) are exactly the rows the rank-1 window collapses,
  * and a skewed line key degrades one sort partition, not a join.
  */
object LineDedup {

  /** (doc_id, line_idx, line) by splitting on real newlines — the
    * production-corpus path. */
  def linesByNewline(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol).as("doc_id"), split(col(textCol), "\n").as("ls"))
      .select(col("doc_id"), posexplode(col("ls")))
      .toDF("doc_id", "line_idx", "line")

  /** (doc_id, line_idx, line) by fixed word grouping — the driver-table
    * path (`documents.text` carries no newlines): line i is words
    * [i·n, i·n + n). Pure integer boundary arithmetic so the oracle
    * replays it exactly. */
  def linesByWords(docs: DataFrame, wordsPerLine: Int, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    require(wordsPerLine >= 1, s"wordsPerLine must be >= 1, got $wordsPerLine")
    docs.select(col(idCol).as("doc_id"), split(col(textCol), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, cast((size(w) + ${wordsPerLine - 1}) div $wordsPerLine as int) - 1),
           |  i -> concat_ws(' ', slice(w, i * $wordsPerLine + 1, $wordsPerLine)))""".stripMargin)))
      .toDF("doc_id", "line_idx", "line")
  }

  /** Tag every line occurrence with `kept` = is this the corpus-wide
    * first occurrence of its content. Single exchange (window partition
    * by line). */
  def dedupLines(lines: DataFrame): DataFrame = {
    val w = Window.partitionBy("line").orderBy("doc_id", "line_idx")
    lines.withColumn("kept", row_number().over(w) === 1)
  }

  /** End-to-end: derive word-grouped lines, drop every non-first
    * occurrence, reassemble each document from its surviving lines (in
    * original order, '\n'-joined; empty string when nothing survives).
    * Returns (doc_id, n_lines, n_kept, text). */
  def dedupCorpus(docs: DataFrame, wordsPerLine: Int): DataFrame =
    dedupLines(linesByWords(docs, wordsPerLine))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("kept"),
              struct(col("line_idx"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text"))
}
