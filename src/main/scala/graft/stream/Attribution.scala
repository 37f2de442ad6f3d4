package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.AsofJoin

/** Last-touch marketing attribution: credit each conversion event to
  * the most recent preceding touch event by the same user within a
  * lookback window — the default attribution model of every product
  * analytics stack (GA's "last non-direct click").
  *
  * Rides the [[graft.util.AsofJoin]] merge-sort kernel: ONE hash
  * exchange on user_id, zero join nodes, no per-conversion candidate
  * set — the same 100 TB shape as q77. The lookback is applied AFTER
  * the as-of match (the nearest touch either is in the window or no
  * touch is), so it costs a projection, not a range join.
  *
  * Cross-engine determinism: DuckDB's ASOF JOIN leaves ties among
  * equal right timestamps unspecified, so touches are first collapsed
  * to one row per (user, ms) keeping the max event_id (ARG_MAX both
  * sides) — after that the as-of match is unique and the kernel's own
  * tiebreak is degenerate. A touch at the conversion's exact
  * millisecond matches (`<=`, both engines).
  */
object Attribution {

  /** @param events      (event_id, user_id, event_type, ts_ms, …)
    * @param convType    the conversion event type
    * @param touchTypes  credited touch types
    * @param lookbackMs  max touch age; older matches emit NULL credit
    * @return one row per conversion: (event_id, user_id,
    *         conversion_ms, touch_id, touch_type, touch_ms) */
  def lastTouch(events: DataFrame, convType: String, touchTypes: Seq[String],
                lookbackMs: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "attribution: touch types must be nonempty and exclude the conversion type")
    val conversions = events.filter(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("ts_ms").as("conversion_ms"))
    val touches = events.filter(col("event_type").isInCollection(touchTypes))
      .groupBy(col("user_id"), col("ts_ms"))
      .agg(max_by(struct(col("event_id"), col("event_type")), col("event_id")).as("t"))
      .select(col("user_id"), col("ts_ms"),
        col("t.event_id").as("touch_id"), col("t.event_type").as("touch_type"))
    val inWindow = col("asof_ts") >= col("conversion_ms") - lookbackMs
    AsofJoin.asofBackward(conversions, touches, Seq("user_id"),
        "conversion_ms", "ts_ms", Seq("touch_id", "touch_type"), "touch_id")
      .select(col("event_id"), col("user_id"), col("conversion_ms"),
        when(inWindow, col("asof_touch_id")).as("touch_id"),
        when(inWindow, col("asof_touch_type")).as("touch_type"),
        when(inWindow, col("asof_ts")).as("touch_ms"))
  }

  /** Multi-touch LINEAR attribution: every touch inside the lookback
    * shares the conversion's credit equally, `credit_e6 = 10⁶ div n`
    * (exact integers — each conversion's credits sum to 10⁶ minus the
    * div remainder, deterministically). Unlike [[lastTouch]] this
    * needs ALL in-window touches, i.e. a point-in-interval join —
    * which Spark plans as BroadcastNestedLoop from a raw BETWEEN.
    * This kernel bins the time axis instead (the [[graft.util.RangeJoin]]
    * trick) AND keys the equi-join by (user_id, bin), so only a
    * user's own bin-local touches ever meet a conversion: one
    * exchange pair, interval blowup ≤ lookback div binWidth + 1 rows
    * per conversion, hot users = AQE skew case. The per-conversion
    * touch count attaches by a second aggregation + equi-join (no
    * window — a bot user's conversion may have unbounded in-window
    * touches).
    *
    * @return one row per (conversion, in-window touch): (event_id,
    *         user_id, conversion_ms, touch_id, touch_type, touch_ms,
    *         credit_e6); untouched conversions are absent */
  def linearTouch(events: DataFrame, convType: String, touchTypes: Seq[String],
                  lookbackMs: Long, binWidthMs: Long): DataFrame = {
    val matched = inWindowTouches(events, convType, touchTypes, lookbackMs, binWidthMs)
    val n = matched.groupBy("event_id").agg(count(lit(1)).as("__n"))
    matched.join(n, Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("conversion_ms"),
        col("touch_id"), col("touch_type"), col("touch_ms"),
        expr("1000000L div __n").as("credit_e6"))
  }

  /** Multi-touch TIME-DECAY attribution — the third canonical model
    * next to [[lastTouch]] and [[linearTouch]]: a touch `age` ms
    * before its conversion earns weight `2^(-age/halfLife)`, so recent
    * touches dominate but every in-window touch keeps some credit.
    * Exact integers via the [[graft.model.Trending]] half-life-bucket
    * trick: `w_e6 = 10⁶ div 2^min(age div halfLife, 40)` (whole
    * half-life buckets — a fractional exponent is a double and cannot
    * hash-match across engines), normalized per conversion as
    * `credit_e6 = w_e6 · 10⁶ div Σw_e6`. Ancient-touch conversions
    * whose every weight truncates to 0 emit credit 0 (guarded — no
    * div-by-zero).
    *
    * Same 100 TB shape as [[linearTouch]]: the shared bin-keyed
    * equi-join candidate frame, then one skinny per-conversion
    * aggregate joined back — no window over unbounded touch lists.
    *
    * @return one row per (conversion, in-window touch): (event_id,
    *         user_id, conversion_ms, touch_id, touch_type, touch_ms,
    *         w_e6, credit_e6); untouched conversions are absent */
  def timeDecayTouch(events: DataFrame, convType: String, touchTypes: Seq[String],
                     lookbackMs: Long, binWidthMs: Long, halfLifeMs: Long): DataFrame = {
    require(halfLifeMs >= 1, "attribution: halfLife must be >= 1 ms")
    val matched = inWindowTouches(events, convType, touchTypes, lookbackMs, binWidthMs)
      .withColumn("w_e6", expr("1000000L div shiftleft(1L, " +
        s"cast(least((conversion_ms - touch_ms) div ${halfLifeMs}L, 40L) as int))"))
    val tot = matched.groupBy("event_id").agg(sum("w_e6").as("__W"))
    matched.join(tot, Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("conversion_ms"),
        col("touch_id"), col("touch_type"), col("touch_ms"), col("w_e6"),
        when(col("__W") > 0, expr("w_e6 * 1000000L div __W"))
          .otherwise(lit(0L)).as("credit_e6"))
  }

  /** Shared candidate frame of the multi-touch models: one row per
    * (conversion, in-window touch), built with the bin-keyed
    * (user_id, time-bin) equi-join described on [[linearTouch]] —
    * never a raw BETWEEN theta-join. */
  private def inWindowTouches(events: DataFrame, convType: String,
                              touchTypes: Seq[String], lookbackMs: Long,
                              binWidthMs: Long): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      "attribution: touch types must be nonempty and exclude the conversion type")
    require(lookbackMs >= 0 && binWidthMs >= 1, "attribution: bad window params")
    val conversions = events.filter(col("event_type") === convType)
      .select(col("event_id"), col("user_id"), col("ts_ms").as("conversion_ms"))
      .withColumn("__bs", expr(s"(conversion_ms - ${lookbackMs}L) div ${binWidthMs}L"))
      .withColumn("__be", expr(s"conversion_ms div ${binWidthMs}L"))
      .withColumn("__bin", explode(expr("sequence(__bs, __be)")))
      .drop("__bs", "__be")
    val touches = events.filter(col("event_type").isInCollection(touchTypes))
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("event_type").as("touch_type"), col("ts_ms").as("touch_ms"))
      .withColumn("__bin", expr(s"touch_ms div ${binWidthMs}L"))
    touches.join(conversions, Seq("user_id", "__bin"))
      .filter(col("touch_ms") >= col("conversion_ms") - lookbackMs &&
        col("touch_ms") <= col("conversion_ms"))
      .drop("__bin")
  }
}
