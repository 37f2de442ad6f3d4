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
}
