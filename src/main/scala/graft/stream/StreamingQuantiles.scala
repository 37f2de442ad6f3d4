package graft.stream

import graft.util.QuantileSketch
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming PERCENTILE MONITORING — the mergeable integer-log-bucket
  * quantile sketch ([[graft.util.QuantileSketch]], q189) lifted onto
  * the ingest-time surface, so p50/p95/p99 dashboards refresh per
  * trigger without ever rescanning history.
  *
  * Why it lifts cleanly: the sketch state is one (bucket → count) map
  * per group and counts ADD under union, so the streaming state after
  * any prefix of the stream is EXACTLY the batch state over the same
  * observations — under any trigger slicing (spec-pinned stream ==
  * batch in StreamingQuantilesSpec) and across checkpoint kill/resume
  * (CheckpointRecoverySpec). State stays bounded at ~64·2^s + 2^s
  * entries per group however long the stream runs (the
  * [[StreamingTrending]] bounded-state discipline).
  *
  * Emission contract ([[StreamingTrending]]/[[StreamingUpsert]]): each
  * trigger emits every UPDATED group's full compacted bucket vector
  * tagged with a state sequence number; the freshest `seq` per group
  * IS the current sketch ([[latestState]] compacts the append log),
  * and [[QuantileSketch.quantiles]] serves percentile reads from it.
  *
  * Bucketing parity: the stream computes bucket indexes in JVM long
  * arithmetic ([[bucketIdxLong]]) which is spec-pinned equal to the
  * SQL [[QuantileSketch.bucketIdx]] over the sign/boundary grid —
  * a disagreement at a single power-of-two boundary would silently
  * split one bucket across engines.
  */
object StreamingQuantiles {

  /** One observation: NULL values must be dropped upstream (the batch
    * form's `state` filter) — `v` is a primitive long here. */
  case class Obs(g: String, v: Long)
  case class SketchRow(g: String, qb: Long, cnt: Long, seq: Long)

  /** JVM twin of [[QuantileSketch.bucketIdx]]: |v| < 2^s → v; else
    * with e = floor(log2 |v|), t = e − s: t·2^s + (|v| >> t), mirrored
    * below zero as −1 − bucket(−v). */
  def bucketIdxLong(v: Long, s: Int): Long = {
    require(v != Long.MinValue, "quantile sketch: Long.MinValue unsupported")
    val cap = 1L << s
    def pos(x: Long): Long =
      if (x < cap) x
      else {
        val t = (63 - java.lang.Long.numberOfLeadingZeros(x)) - s
        t.toLong * cap + (x >> t)
      }
    if (v >= 0L) pos(v) else -1L - pos(-v)
  }

  /** Batch reference form: [[QuantileSketch.state]] over one group
    * column — (g, qb, cnt). */
  def sketchBatch(df: DataFrame, groupCol: String, valueCol: String,
                  s: Int = 5): DataFrame =
    QuantileSketch.state(df, Seq(groupCol), valueCol, s)
      .withColumnRenamed(groupCol, "g")

  /** Stateful streaming form: the freshest `seq` per group equals
    * [[sketchBatch]] on the same observations under ANY trigger
    * slicing. */
  def sketchStream(obs: Dataset[Obs], s: Int = 5): Dataset[SketchRow] = {
    import obs.sparkSession.implicits._
    obs.groupByKey(_.g)
      .flatMapGroupsWithState[(Map[Long, Long], Long), SketchRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[Obs], state: GroupState[(Map[Long, Long], Long)]) =>
          var (m, seq) = state.getOption.getOrElse((Map.empty[Long, Long], 0L))
          var changed = false
          it.foreach { o =>
            val qb = bucketIdxLong(o.v, s)
            m = m.updated(qb, m.getOrElse(qb, 0L) + 1L)
            changed = true
          }
          if (!changed) Iterator.empty
          else {
            seq += 1
            state.update((m, seq))
            m.toSeq.sortBy(_._1)
              .map { case (qb, c) => SketchRow(g, qb, c, seq) }.iterator
          }
      }
  }

  /** Freshest emission per group → the (g, qb, cnt) state table the
    * batch form produces (the [[StreamingUpsert]] compaction). */
  def latestState(rows: DataFrame): DataFrame = {
    val mx = rows.groupBy("g").agg(max("seq").as("seq"))
    rows.join(mx, Seq("g", "seq")).select("g", "qb", "cnt")
  }
}
