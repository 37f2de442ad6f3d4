package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** The composed streaming pipeline the mandate's north-star surface
  * implies — three stateful kernels CHAINED in ONE streaming query
  * (each was previously proven only in isolation):
  *
  *   sessionize (q35 kernel) → session-count funnel → trending (q163)
  *
  * Semantics: gap-sessionize each user's event stream; each completed
  * session advances the user's repeat-usage funnel (stage = their
  * session ordinal, capped at `maxStage` — 1st / 2nd / 3rd+ visit, the
  * classic retention funnel); trending half-life-decays the per-stage
  * completion counts, so the serve answers "which conversion depth is
  * hot right now".
  *
  * Spark permits multiple flatMapGroupsWithState operators in one
  * query only when ALL are in Append mode with append output
  * (UnsupportedOperationChecker) — all three kernels here are. The
  * downstream operators carry NO event-time logic (NoTimeout, no
  * event-time filters; trending's bucket pruning is count-monotone,
  * pinned batch == stream under any slicing by StreamingTrendingSpec),
  * so the global-watermark late-row hazard the correctness checker
  * guards against cannot bite: only the FIRST operator consumes the
  * watermark, for session-timeout emission. The checker cannot see
  * that and conservatively rejects the chain — deployments must set
  * `spark.sql.streaming.statefulOperator.checkCorrectness.enabled =
  * false` for THIS query (sound here for exactly the reason above;
  * the soak spec pins stream == batch under sliced triggers as the
  * evidence). Feed triggers in event-time order: stragglers behind
  * the SOURCE watermark are dropped before the first kernel, the
  * standard watermark contract.
  *
  * [[batch]] is the equivalent relational form (one SQL-replayable
  * plan — q175's oracle); the soak spec pins stream == batch across
  * trigger slicings.
  */
object SessionFunnelTrending {

  /** Second stage: completed sessions → funnel-stage completion events
    * `(stage = min(user's session ordinal, maxStage), ts = session
    * end)`. Per-user state is ONE long (the session count) forever —
    * the q136 funnel-state discipline. Within a trigger a user's
    * sessions fold in session_start order (the first kernel emits them
    * in order, but fMGWS iterator order is not contractual). */
  def sessionMilestones(sessions: Dataset[EventStreams.Session],
                        maxStage: Int): Dataset[StreamingTrending.Interaction] = {
    require(maxStage >= 1, "sessionMilestones: maxStage >= 1")
    import sessions.sparkSession.implicits._
    sessions.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, StreamingTrending.Interaction](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[EventStreams.Session], state: GroupState[Long]) =>
          var cnt = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(s => (s.session_start.getTime, s.session_end.getTime))
            .map { s =>
              cnt += 1
              StreamingTrending.Interaction(math.min(cnt, maxStage.toLong),
                s.session_end.getTime)
            }
          state.update(cnt)
          out.iterator
      }
  }

  /** The composed stream: events (watermarked by the caller — the
    * first kernel's session timeout needs it) → per-stage trending
    * bucket state rows. Serve with
    * [[StreamingTrending.trendingFromBuckets]] over the freshest `seq`
    * per stage (the q104 upsert discipline). */
  def stream(events: Dataset[EventStreams.Event], gapMs: Long, maxStage: Int,
             halfLifeMs: Long, keep: Int): Dataset[StreamingTrending.BucketRow] =
    StreamingTrending.bucketCountsStream(
      sessionMilestones(EventStreams.sessionize(events, gapMs), maxStage),
      halfLifeMs, keep)

  /** Batch reference form — value-equal to the stream's final state
    * (soak-pinned) and SQL-replayable (q175's oracle): sessionizeBatch
    * already numbers sessions per user in (ts, event_id) order, so the
    * funnel stage is just `least(session_id, maxStage)`.
    * @return (stage, score_e6, n) — top-k stages by decayed count */
  def batch(events: DataFrame, gapMs: Long, maxStage: Int,
            halfLifeMs: Long, keep: Int, k: Int): DataFrame = {
    val milestones = EventStreams.sessionizeBatch(events, gapMs)
      .select(least(col("session_id"), lit(maxStage.toLong)).as("item_id"),
        col("session_end").as("ts"))
    StreamingTrending.trendingFromBuckets(
      StreamingTrending.bucketCountsBatch(milestones, halfLifeMs, keep), k)
      .withColumnRenamed("item_id", "stage")
  }
}
