package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Session journey analysis — the corpus-wide event-type transition
  * matrix ("after viewing, 40% click, 25% bounce") that product
  * analytics reads off gap-sessionized logs: every adjacent pair of
  * events inside a session is a transition, with `^` marking session
  * entry and `$` session exit, so row-normalizing the output yields
  * the session Markov chain including entry/exit probabilities.
  *
  * Physical plan: ONE exchange. Session breaks ([[EventStreams
  * .sessionizeBatch]]'s gap rule) and both lookaheads ride the SAME
  * window spec — `(user_id; ms, event_id)` — so Spark plans a single
  * hash exchange with the sort reused across the chained WindowExecs
  * (user_id is a high-cardinality key; no low-cardinality window
  * trap). The exit test needs no per-session window: sessions are
  * contiguous runs in the per-user order, so "next event starts a
  * new session" (lead of the start flag) IS the session boundary.
  * Both edges a row can emit (its transition, plus the `^` entry
  * edge when it starts a session) leave in one explode — the
  * windowed subplan is never referenced twice. The final
  * (from, to) count combines map-side into a types²-sized matrix.
  */
object Journeys {

  /** Returns (from_type, to_type, n) over gap-sessionized per-user
    * event runs; `^`/`$` are entry/exit pseudo-states. Ordering ties
    * break by `event_id` (a total order both engines share). */
  def sessionTransitions(events: DataFrame, gapMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("__ms", "event_id")
    events
      .withColumn("__ms", unix_millis(col("ts").cast("timestamp")))
      .withColumn("__new", when(
        col("__ms") - lag("__ms", 1).over(w) > gapMs || lag("__ms", 1).over(w).isNull, 1)
        .otherwise(0))
      .withColumn("__nt", lead("event_type", 1).over(w))
      .withColumn("__nn", lead("__new", 1).over(w))
      .select(explode(concat(
        array(struct(
          col("event_type").as("from_type"),
          when(col("__nn").isNull || col("__nn") === 1, lit("$"))
            .otherwise(col("__nt")).as("to_type"))),
        when(col("__new") === 1,
          array(struct(lit("^").as("from_type"), col("event_type").as("to_type"))))
          .otherwise(expr("array()").cast("array<struct<from_type:string,to_type:string>>"))))
        .as("e"))
      .select(col("e.from_type").as("from_type"), col("e.to_type").as("to_type"))
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
  }
}
