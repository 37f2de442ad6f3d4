package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table (driver mandate;
  * the reference is fully batch — SURVEY §2.9). The transforms are
  * shared between batch and streaming DataFrames: the same windowed
  * aggregation answers SparkEntry's q23/q32 in batch and runs
  * incrementally under a watermark here.
  */
object EventStreams {

  /** Open a file-source stream over a directory of events parquet.
    * File streams need an explicit schema; probe it from a batch read of
    * the same directory so both testdata layouts (legacy nanos-long and
    * current TIMESTAMP_MICROS — see [[graft.Tables.normalizeEventTs]])
    * stream with the correct reader schema, then normalize `ts` exactly
    * as the batch loader does. (`maxFilesPerTrigger` keeps local smoke
    * tests incremental.) */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val probed = graft.Tables.readEventsRaw(spark, dir).schema
    graft.Tables.normalizeEventTs(
      spark.readStream.schema(probed)
        .option("maxFilesPerTrigger", 1)
        .parquet(dir))
  }

  /** Streaming exact dedup — the at-least-once ingest gate of a
    * training-data pipeline: duplicates by `keys` are dropped within the
    * `watermark` event-time horizon, so dedup state is BOUNDED — key
    * state older than the watermark evicts, unlike `dropDuplicates`,
    * whose streaming state grows without bound. A batch frame dedups
    * whole (Spark rejects the watermark variant outside streaming), so
    * backfill and the live stream share this one entry point.
    *
    * KNOWN DIVERGENCE between the two paths, inherent to bounded state:
    * duplicates spaced FURTHER apart than `watermark` in event time
    * survive the live stream (the first copy's state already evicted)
    * but are dropped by a batch replay of the same data, which dedups
    * globally. The two paths agree exactly when all duplicate pairs
    * arrive within the watermark horizon — the at-least-once-redelivery
    * case this gate exists for. Pick `watermark` ≥ the source's maximum
    * redelivery window to make the divergence unobservable. */
  def dedupEvents(events: DataFrame, keys: Seq[String],
                  watermark: String = "2 hours"): DataFrame = {
    require(keys.nonEmpty, "dedupEvents: at least one key column")
    if (events.isStreaming)
      events.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
    else events.dropDuplicates(keys)
  }

  /** Exposure→outcome interval label join — the attribution join of a
    * training-data pipeline (impression→click, send→open, …): emit every
    * (exposure, outcome) pair from the same user where the outcome lands
    * strictly after the exposure and within `horizon` of it. The pair
    * stream is what a labeler aggregates into positives; exposures that
    * never pair are the negatives (batch: left_anti against these pairs).
    *
    * Batch and streaming share this entry point. When both inputs
    * stream, pass `watermark`: Spark requires watermarks plus the
    * time-interval condition to bound stream-stream join state — each
    * side's buffer evicts once it falls `watermark + horizon` behind the
    * stream, so state is bounded regardless of run length. At scale the
    * join shuffles both sides on user_id only (the time predicate is
    * evaluated within the key group). */
  def labelJoin(exposures: DataFrame, outcomes: DataFrame, horizon: String,
                watermark: Option[String] = None): DataFrame = {
    val e = watermark.fold(exposures)(w => exposures.withWatermark("ts", w))
      .select(col("event_id").as("exposure_id"), col("user_id"), col("ts").as("exp_ts"))
    val o = watermark.fold(outcomes)(w => outcomes.withWatermark("ts", w))
      .select(col("event_id").as("outcome_id"), col("user_id").as("__ou"), col("ts").as("out_ts"))
    e.join(o, col("user_id") === col("__ou")
        && col("out_ts") > col("exp_ts")
        && col("out_ts") <= col("exp_ts") + expr(s"INTERVAL $horizon"))
      .select(col("exposure_id"), col("outcome_id"), col("user_id"),
        (unix_millis(col("out_ts").cast("timestamp")) -
          unix_millis(col("exp_ts").cast("timestamp"))).as("lag_ms"))
  }

  /** Training-set assembly over [[labelJoin]]: one row per exposure with
    * a binary label — 1 if ANY outcome landed within the horizon, else 0
    * — plus the match count and the earliest-outcome lag (null on
    * negatives). Batch form of the labeler that closes the
    * exposure→outcome pipeline; the left join keeps every negative, which
    * is most of the training set. */
  def labeledExposures(exposures: DataFrame, outcomes: DataFrame,
                       horizon: String): DataFrame = {
    val pairs = labelJoin(exposures, outcomes, horizon)
      .groupBy(col("exposure_id"))
      .agg(count(lit(1)).as("n_outcomes"), min("lag_ms").as("first_lag_ms"))
    exposures.select(col("event_id").as("exposure_id"), col("user_id"),
        unix_millis(col("ts").cast("timestamp")).as("exp_ms"))
      .join(pairs, Seq("exposure_id"), "left")
      .select(col("exposure_id"), col("user_id"), col("exp_ms"),
        when(col("n_outcomes").isNull, 0).otherwise(1).as("label"),
        coalesce(col("n_outcomes"), lit(0L)).as("n_outcomes"),
        col("first_lag_ms"))
  }

  /** Shared batch/stream transform: tumbling (or sliding) window
    * aggregation with an event-time watermark when streaming. */
  def windowedAgg(events: DataFrame, windowLen: String, slide: Option[String] = None,
                  watermark: Option[String] = None): DataFrame = {
    val withWm = watermark.fold(events)(w => events.withWatermark("ts", w))
    val win = slide.fold(window(col("ts"), windowLen))(s => window(col("ts"), windowLen, s))
    withWm
      .groupBy(win.as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Streaming top-k refresh: per-window item popularity ranked in the
    * sink (rank-over-window is not incremental; the stream emits
    * per-(window, key) aggregates and the top-k is a cheap sorted read
    * of the in-memory/Delta sink — the standard streaming pattern). */
  def popularityCounts(events: DataFrame, windowLen: String, watermark: String): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("user_id"), col("n_events"))

  /** Batch gap-sessionization as pure window algebra (the classic
    * lag/cumsum formulation — fully oracle-replayable SQL, unlike the
    * stateful streaming variant below): a session breaks where the gap
    * from the previous event exceeds `gapMs`. */
  def sessionizeBatch(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("__ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("__new", when(
        col("__ms") - lag("__ms", 1).over(w) > gapMs || lag("__ms", 1).over(w).isNull, 1)
        .otherwise(0))
      .withColumn("session_id", sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_id")
      .agg(min("__ms").as("session_start"), max("__ms").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 4).as("total_value"))
  }

  /** Per-window item top-k (batch form of the streaming top-k refresh):
    * rank inside each (window, key) aggregate. */
  def topKPerWindow(events: DataFrame, windowLen: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    events
      .groupBy(window(col("ts"), windowLen).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("w").orderBy(col("n_events").desc, col("user_id"))))
      .filter(col("rank") <= k)
      .select(unix_millis(col("w.start").cast("timestamp")).as("ws"),
        col("user_id"), col("n_events"), col("rank"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class Session(user_id: Long, session_start: java.sql.Timestamp,
                     session_end: java.sql.Timestamp, n_events: Long, total_value: Double)
  // NOT private: the streaming state serializer generates Java that
  // constructs/reads this class; Janino cannot resolve members of a
  // Scala-private nested class.
  case class SessionState(start: Long, end: Long, n: Long, total: Double)

  case class AsofRight(ts: Long, id: Long, value: Double)
  // state: right-side history within the watermark horizon, ascending
  // (ts, id); see AsofBuf eviction note in [[asofEnrich]]
  case class AsofBuf(rights: List[AsofRight])
  case class AsofEnriched(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                          asof_event_id: java.lang.Long, asof_ts: java.sql.Timestamp,
                          asof_value: java.lang.Double)

  /** Streaming point-in-time enrich — the streaming form of
    * [[graft.util.AsofJoin.asofBackward]]: each `leftType` event is
    * enriched with the latest `rightType` event at-or-before its
    * timestamp for the same user (ties: max event_id), as a stateful
    * operator instead of a join.
    *
    * State per key is the right-side history inside the watermark
    * horizon PLUS one floor row (the latest right older than the
    * watermark): any future left has event time ≥ watermark, so the
    * floor row alone answers every below-horizon lookup — history
    * below it can never be an answer again and evicts. State is
    * therefore bounded by the horizon, and an idle key degrades to ONE
    * row (a compacted latest-value snapshot), which is the product a
    * point-in-time store keeps anyway.
    *
    * Exactness contract (same family as [[dedupEvents]]'s): arbitrary
    * reordering WITHIN a trigger batch is invisible (rows are replayed
    * in event-time order), and late LEFT rows within the watermark are
    * answered correctly from the buffer; only a RIGHT row that arrives
    * after a later-ts left was already emitted cannot retro-correct
    * that append-mode output. A batch invocation of this same operator
    * (one group pass, empty initial state) is globally exact and equals
    * `asofBackward` row-for-row — pinned in the spec. */
  def asofEnrich(events: Dataset[Event], leftType: String, rightType: String): Dataset[AsofEnriched] = {
    import events.sparkSession.implicits._
    events.filter(e => e.event_type == leftType || e.event_type == rightType)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofBuf, AsofEnriched](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[AsofBuf]) =>
          // rights sort before lefts at equal ts (a right AT the left's
          // timestamp matches), max event_id last among equal-ts rights
          val rows = it.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.event_type == rightType) 0 else 1, e.event_id))
          var buf = state.getOption.map(_.rights).getOrElse(Nil)
          val out = List.newBuilder[AsofEnriched]
          rows.foreach { e =>
            val t = e.ts.getTime
            if (e.event_type == rightType) {
              buf = ((AsofRight(t, e.event_id, e.value)) :: buf)
                .sortBy(r => (r.ts, r.id))
            } else {
              val m = buf.foldLeft(Option.empty[AsofRight]) {
                case (acc, r) => if (r.ts <= t) Some(r) else acc // asc scan: last ≤ t wins
              }
              out += AsofEnriched(user, e.event_id, e.ts,
                m.map(r => java.lang.Long.valueOf(r.id)).orNull,
                m.map(r => new java.sql.Timestamp(r.ts)).orNull,
                m.map(r => java.lang.Double.valueOf(r.value)).orNull)
            }
          }
          // evict: everything below the watermark except the floor row
          val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
          if (wm > 0) {
            val (old, recent) = buf.partition(_.ts < wm)
            buf = old.lastOption.toList ::: recent
          }
          if (buf.nonEmpty) state.update(AsofBuf(buf))
          out.result().iterator
      }
  }

  /** Custom stateful operator: gap-based sessionization with
    * flatMapGroupsWithState (M-streaming; no reference analogue). Emits
    * a session row when `gapMs` of event-time silence passes. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          def finish(s: SessionState) = Session(user, new java.sql.Timestamp(s.start),
            new java.sql.Timestamp(s.end), s.n, s.total)
          if (state.hasTimedOut) {
            // The timer fired because the watermark passed end+gap: the open
            // session is final. Emit and clear WITHOUT re-arming the timer —
            // re-arming behind the watermark throws IllegalArgumentException
            // and kills the whole query.
            val out = state.getOption.map(finish).iterator
            state.remove()
            out
          } else {
            var out = List.empty[Session]
            var cur = state.getOption
            it.toSeq.sortBy(_.ts.getTime).foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(s.copy(end = t, n = s.n + 1, total = s.total + e.value))
                case Some(s) =>
                  out ::= finish(s)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Clamp to just above the watermark: a key whose event time
              // lags the global watermark by more than gapMs would otherwise
              // arm a timer already in the past, which GroupStateImpl
              // rejects. (In batch runs there is no watermark — Try absorbs
              // the UnsupportedOperationException and leaves end+gap.)
              val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(-1L)
              state.setTimeoutTimestamp(math.max(wm + 1, s.end + gapMs))
            }
            out.reverseIterator
          }
      }
  }
}
