package graft.stream

import graft.util.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming FREQUENCY monitoring — the Count-Min sketch
  * ([[graft.util.Sketches]] cmsCounters/cmsEstimate, q178) lifted onto
  * the ingest-time surface, completing the streaming sketch family
  * (quantiles: [[StreamingQuantiles]], distinct: [[StreamingDistinct]],
  * frequency: here): per-key overestimate-bounded counts that refresh
  * per trigger with depth × width state FOREVER, however many distinct
  * keys flow past — the hot-key / hot-token alarm at 100 TB where an
  * exact streaming count map is unbounded.
  *
  * Why it lifts cleanly: counters ADD under union (the
  * [[StreamingQuantiles]] law), so the streaming state after any
  * prefix equals the batch counter table over the same rows, under any
  * trigger slicing and across checkpoint kill/resume. Each of the
  * `depth` hash rows is one flatMapGroupsWithState group (key = row
  * index; observations fan out depth ways BEFORE the stateful op), so
  * row state is a ≤ width counter map and rows parallelize.
  *
  * Hash parity: the stream hashes in JVM long arithmetic
  * ([[StreamingDistinct.h52Long]] over the "key|row" rendering),
  * spec-pinned equal to the SQL [[Sketches.cmsCounters]] cells.
  */
object StreamingCms {

  /** One fanned-out observation: hash-row index + rendered key +
    * weight (pre-fanned: one input row becomes `depth` Obs). */
  case class Obs(row: Int, k: String, w: Long)
  case class CounterRow(row: Int, idx: Long, c: Long, seq: Long)

  /** Fan a raw key stream out to depth × rows: the narrow pre-stage
    * before [[countersStream]]. */
  def fanOut(keys: Dataset[String], depth: Int, weight: Long = 1L): Dataset[Obs] = {
    import keys.sparkSession.implicits._
    keys.flatMap(k => (0 until depth).map(j => Obs(j, k, weight)))
  }

  /** Batch reference form: [[Sketches.cmsCounters]] over the NULL-free
    * key rows — the stream kernel skips null keys (no hashable
    * rendering exists for them), so the batch twin must drop them too
    * or the spec-pinned stream == batch contract breaks on the first
    * null: cmsCounters alone would hash a null key to a NULL idx
    * counter row the stream never produces. */
  def countersBatch(df: DataFrame, keyCols: Seq[String], depth: Int,
                    width: Int, seed: Long): DataFrame =
    Sketches.cmsCounters(
      df.filter(keyCols.map(col(_).isNotNull).reduce(_ && _)),
      keyCols, depth, width, seed)

  /** Stateful streaming form: per-row counter map; each trigger emits
    * every updated row's full counter vector tagged with a state
    * sequence number — freshest `seq` per row IS the current sketch. */
  def countersStream(obs: Dataset[Obs], width: Int, seed: Long): Dataset[CounterRow] = {
    require(width >= 2, s"cms: width >= 2, got $width")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.row)
      .flatMapGroupsWithState[(Map[Long, Long], Long), CounterRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (row: Int, it: Iterator[Obs], state: GroupState[(Map[Long, Long], Long)]) =>
          var (m, seq) = state.getOption.getOrElse((Map.empty[Long, Long], 0L))
          var changed = false
          it.foreach { o =>
            if (o.k != null) {
              // the cmsCounters rendering: h52("key|row|seed") % width
              val idx = java.lang.Long.remainderUnsigned(
                StreamingDistinct.h52Long(seed, s"${o.k}|${o.row}"), width.toLong)
              m = m.updated(idx, m.getOrElse(idx, 0L) + o.w)
              changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            seq += 1
            state.update((m, seq))
            m.toSeq.sortBy(_._1)
              .map { case (idx, c) => CounterRow(row, idx, c, seq) }.iterator
          }
      }
  }

  /** Freshest emission per row → the (row, idx, c) counter table the
    * batch form produces. */
  def latestState(rows: DataFrame): DataFrame = {
    val mx = rows.groupBy("row").agg(max("seq").as("seq"))
    rows.join(mx, Seq("row", "seq")).select("row", "idx", "c")
  }

  /** Point estimates off a counter table — [[Sketches.cmsEstimate]]. */
  def estimates(counters: DataFrame, queries: DataFrame, keyCols: Seq[String],
                depth: Int, width: Int, seed: Long): DataFrame =
    Sketches.cmsEstimate(counters, queries, keyCols, depth, width, seed)
}
