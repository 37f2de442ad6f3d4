package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** @param steps ordered distinct step types; k = steps.length
    * @return (user_id, step0_ms .. step{k-1}_ms, stage) */
  def windowFunnel(events: DataFrame, userCol: String, typeCol: String,
                   tsMsCol: String, steps: Seq[String]): DataFrame = {
    val k = steps.length
    require(k >= 1 && steps.distinct.size == k, "funnel: steps must be distinct and nonempty")
    require(steps.forall(s => !s.contains("'")), "funnel: step names must not contain quotes")
    val stepsLit = steps.map(s => s"'$s'").mkString("array(", ", ", ")")
    val walk =
      s"""aggregate(
         |  evs,
         |  array_repeat(-1L, $k),
         |  (acc, e) -> transform(acc, (x, i) ->
         |    CASE WHEN x <> -1L THEN x
         |         WHEN array_position($stepsLit, e.et) = i + 1
         |              AND (i = 0 OR (acc[i - 1] <> -1L AND e.ts_ms > acc[i - 1]))
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
}
