package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Ordered-step conversion funnel over an event log — the product
  * analytics primitive behind "view → click → purchase" dashboards
  * (ClickHouse ships it as `windowFunnel`; this is the exact
  * unwindowed form): for each user, the timestamp at which each step
  * first completes, where step i counts only STRICTLY AFTER step i−1
  * completed. Emits one row per user with the per-step epoch-millis
  * (−1 = never reached) and the furthest stage index — reached steps
  * are always a prefix, so `stage` is simply the count of non-(−1)s.
  *
  * Physical plan: ONE shuffle — filter to the step types, group by
  * user, sort the per-user (ts, type) array, and walk it with a
  * codegen'd `aggregate` HOF whose accumulator is the k-slot
  * timestamp array. The walk is the standard funnel evaluation (the
  * first step-i event after t_{i−1} in ascending order IS the
  * minimum such event, and a set slot is never overwritten, so the
  * sorted walk equals the unrolled min-after-min SQL form the oracle
  * replays). Per-user state is the events of that user for the
  * filtered step types — for adversarially hot users pre-cap with
  * [[graft.util.TopK]] by ts per (user, type); the funnel only ever
  * needs each type's earliest events.
  *
  * Tie semantics (cross-engine exact): equal timestamps sort by
  * (ts, type) and progression is strict (`>`), so a click at
  * exactly the first view's millisecond does NOT advance — both
  * engines agree because both compare epoch-millis longs.
  */
object Funnel {

  /** @param steps     ordered distinct step types; k = steps.length
    * @param horizonMs  conversion window (ClickHouse windowFunnel's
    *                   `window`): when set, steps 2..k must land
    *                   within `horizonMs` of the FIRST step's
    *                   completion time — the anchor is the earliest
    *                   step-1 event (greedy, deterministic; a later
    *                   anchor is never retried, which is the
    *                   min-after-min semantics the oracle replays)
    * @return (user_id, step0_ms .. step{k-1}_ms, stage) */
  def windowFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsMsCol: String, steps: Seq[String],
                   horizonMs: Option[Long] = None): DataFrame = {
    val k = steps.length
    require(k >= 1 && steps.distinct.size == k, "funnel: steps must be distinct and nonempty")
    require(steps.forall(s => !s.contains("'")), "funnel: step names must not contain quotes")
    val stepsLit = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    // for i >= 1 the prefix property guarantees acc[0] is set, so the
    // horizon test never reads the -1 sentinel
    val horizonCond = horizonMs
      .map(h => s"\n              AND (i = 0 OR e.ts_ms <= acc[0] + ${h}L)")
      .getOrElse("")
    val walk =
      s"""aggregate(
         |  evs,
         |  array_repeat(-1L, $k),
         |  (acc, e) -> transform(acc, (x, i) ->
         |    CASE WHEN x <> -1L THEN x
         |         WHEN array_position($stepsLit, e.et) = i + 1
         |              AND (i = 0 OR (acc[i - 1] <> -1L AND e.ts_ms > acc[i - 1]))$horizonCond
         |         THEN e.ts_ms ELSE x END))""".stripMargin
    events
      .filter(col(typeCol).isInCollection(steps))
      .select(col(userCol).as("user_id"),
        col(tsMsCol).as("ts_ms"), col(typeCol).as("et"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(struct(col("ts_ms"), col("et")))).as("evs"))
      // staged projection: the walk runs ONCE per row; the k+1
      // consumers read the cached array (CollapseProject keeps the
      // stages apart because the alias is multi-referenced and
      // expensive — the q99 lambda-CSE pattern)
      .select(col("user_id"), expr(walk).as("acc"))
      .select(col("user_id") +: (
        (0 until k).map(i => col("acc")(i).as(s"step${i}_ms")) :+
          expr("size(filter(acc, x -> x <> -1L))").as("stage")): _*)
  }

  case class FunnelSlots(slots: List[Long])
  case class FunnelProgress(user_id: Long, slots: List[Long], stage: Int)

  /** Stateful streaming form of [[windowFunnel]]: per-user funnel
    * slots live in flatMapGroupsWithState; a trigger emits a
    * progress row when the user is first seen or any slot advances
    * (append mode — dashboards consume funnel PROGRESS events).
    * State is k longs per user, forever (funnels have no horizon;
    * bound the key space upstream if users are unbounded).
    *
    * Same caveat as [[EventStreams.asofEnrich]]: an event arriving
    * out of order ACROSS triggers cannot retro-correct an earlier
    * skip (a view landing after its click was already rejected).
    * Within a trigger, events fold in (ts, type) order — the batch
    * walk's exact order — so a BATCH invocation (one group pass,
    * empty initial state) equals [[windowFunnel]] row-for-row,
    * which is how q136 runs under the oracle; streaming equals
    * batch on trigger-ordered feeds (spec-pinned across triggers).
    */
  def statefulProgress(events: Dataset[EventStreams.Event],
                       steps: Seq[String]): Dataset[FunnelProgress] = {
    val k = steps.length
    require(k >= 1 && steps.distinct.size == k, "funnel: steps must be distinct and nonempty")
    val stepIdx = steps.zipWithIndex.toMap
    import events.sparkSession.implicits._
    events.filter(e => stepIdx.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelSlots, FunnelProgress](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, it: Iterator[EventStreams.Event], state) =>
          val first = !state.exists
          val slots0 = state.getOption.map(_.slots).getOrElse(List.fill(k)(-1L))
          val slots = slots0.toArray
          it.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
            val s = stepIdx(e.event_type)
            if (slots(s) == -1L &&
              (s == 0 || (slots(s - 1) != -1L && e.ts.getTime > slots(s - 1))))
              slots(s) = e.ts.getTime
          }
          val out = slots.toList
          state.update(FunnelSlots(out))
          if (first || out != slots0)
            Iterator(FunnelProgress(user, out, out.count(_ != -1L)))
          else Iterator.empty
      }
  }
}
