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
  * Scale shape: one exchange keyed by line content (a two-stage
  * min-aggregate — map-side partial aggregation collapses each line's
  * occurrences per input partition before the shuffle), one exchange
  * keyed by doc_id (the reassembly groupBy). Line content is the
  * natural dedup key at 100 TB: hot lines (boilerplate headers, cookie
  * banners) are exactly the rows the partial aggregate collapses, so a
  * skewed line key costs one combined row per input partition — no
  * task ever sorts a hot line's occurrence list.
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
    // r15: the split+transform+slice+concat_ws grouping is
    // [[graft.functions.WordShingles.lines]] — each line is a
    // contiguous byte span of the text (tokens re-join with the same
    // single spaces split cut on), emitted zero-copy; spec-pinned
    // equal, including the partial tail line and "" -> one empty line
    docs.select(col(idCol).as("doc_id"), posexplode(
        graft.functions.WordShingles.lines(col(textCol), wordsPerLine)))
      .toDF("doc_id", "line_idx", "line")
  }

  /** Tag every line occurrence with `kept` = is this the corpus-wide
    * first occurrence of its content. Single exchange (window partition
    * by line) — use when the caller needs the flag on EVERY occurrence.
    * A pathologically hot line (hundreds of millions of boilerplate
    * occurrences) lands in one task's sort here; [[firstOccurrences]]
    * is the escape hatch when only the kept set is needed. */
  def dedupLines(lines: DataFrame): DataFrame = {
    val w = Window.partitionBy("line").orderBy("doc_id", "line_idx")
    lines.withColumn("kept", row_number().over(w) === 1)
  }

  /** The kept set alone — (doc_id, line_idx, line) of each distinct
    * line's corpus-wide first occurrence — as a two-stage
    * min(struct(doc_id, line_idx)) aggregate. Map-side partial
    * aggregation collapses a hot line to one candidate row PER INPUT
    * PARTITION before the shuffle, so no task ever sorts the hot
    * line's occurrence list (the [[dedupLines]] window shape does).
    * Same kept contract: first = min under (doc_id, line_idx). */
  def firstOccurrences(lines: DataFrame): DataFrame =
    lines.groupBy("line")
      .agg(min(struct(col("doc_id"), col("line_idx"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.line_idx").as("line_idx"),
        col("line"))

  /** End-to-end: derive word-grouped lines, drop every non-first
    * occurrence, reassemble each document from its surviving lines (in
    * original order, '\n'-joined; empty string when nothing survives).
    * Returns (doc_id, n_lines, n_kept, text).
    *
    * Built on [[firstOccurrences]], not the tagging window: the kept
    * set IS the aggregate's output, so the corpus takes one line-keyed
    * partial-agg exchange + one doc-keyed reassembly exchange, and the
    * per-doc line totals come from a separate skinny count — no sort
    * over any line's occurrence list, hot-line-proof. */
  def dedupCorpus(docs: DataFrame, wordsPerLine: Int): DataFrame = {
    val lines = linesByWords(docs, wordsPerLine)
    val totals = lines.groupBy("doc_id").agg(count(lit(1)).as("n_lines"))
    val kept = firstOccurrences(lines)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("line_idx"), col("line")))),
            x => x.getField("line")),
          "\n").as("text"))
    totals.join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }
}
