package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Streaming "what's hot now": the stateful form of
  * [[graft.model.Trending]] (q149's exact power-of-two half-life
  * decay), maintained incrementally so a top-k refresh never rescans
  * history.
  *
  * Exact decay cannot be a single per-item scalar — the score at
  * reference time T re-weights EVERY past event — but it IS a linear
  * function of per-(item, absolute half-life bucket) counts, and only
  * the newest `keep` buckets of an item can ever carry nonzero weight
  * (ages ≥ 40 half-lives clamp to 0). So:
  *
  *  - STATE per item: `bucket → count` for buckets within `keep` of
  *    the item's max bucket — bounded at ~41 longs however long the
  *    stream runs; monotone pruning (an item's max bucket only grows,
  *    so a bucket pruned early is exactly a bucket the batch form's
  *    final-window filter also drops — late arrivals into pruned
  *    buckets are dropped by both, spec-pinned batch == stream under
  *    any trigger slicing).
  *  - EMIT per trigger: each updated item's full compacted bucket
  *    vector, tagged with a state sequence number; the freshest `seq`
  *    per item is the current state (the StreamingUpsert append
  *    discipline).
  *  - SERVE: [[trendingFromBuckets]] — a skinny rollup over ≤ 41
  *    rows/item: `score = Σ n·(10⁶ div 2^(maxBucket − b))`, global
  *    top-k via TakeOrderedAndProject. The serving weights use
  *    BUCKET-INDEX age (maxBucket − b), the incremental sibling of
  *    q149's event-age `(mx − ts) div H` — both exact integer decays;
  *    q163 oracles this form end-to-end in DuckDB.
  */
object StreamingTrending {

  case class Interaction(item_id: Long, ts: Long)
  case class BucketRow(item_id: Long, bucket: Long, n: Long, seq: Long)

  /** Batch reference form: per-(item, bucket) counts, retaining only
    * the newest `keep` buckets per item. */
  def bucketCountsBatch(interactions: DataFrame, halfLifeMs: Long, keep: Int): DataFrame = {
    require(halfLifeMs >= 1 && keep >= 1, "trending: bad params")
    val b = interactions
      .select(col("item_id"), expr(s"ts div ${halfLifeMs}L").as("bucket"))
      .groupBy("item_id", "bucket").agg(count(lit(1)).as("n"))
    val mb = b.groupBy("item_id").agg(max("bucket").as("__mb"))
    b.join(mb, Seq("item_id"))
      .filter(col("bucket") > col("__mb") - keep)
      .select("item_id", "bucket", "n")
  }

  /** Stateful streaming form — final state (freshest `seq` per item)
    * equals [[bucketCountsBatch]] on the same events under ANY trigger
    * slicing. */
  def bucketCountsStream(interactions: Dataset[Interaction], halfLifeMs: Long,
                         keep: Int): Dataset[BucketRow] = {
    require(halfLifeMs >= 1 && keep >= 1, "trending: bad params")
    import interactions.sparkSession.implicits._
    interactions.groupByKey(_.item_id)
      .flatMapGroupsWithState[(Map[Long, Long], Long), BucketRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (item: Long, it: Iterator[Interaction], state: GroupState[(Map[Long, Long], Long)]) =>
          var (m, seq) = state.getOption.getOrElse((Map.empty[Long, Long], 0L))
          var changed = false
          it.foreach { e =>
            // truncating division, NOT floorDiv — must bucket exactly like
            // the batch form's SQL `ts div H` (and the DuckDB oracle) for
            // pre-epoch timestamps, or the pinned batch == stream breaks
            val b = e.ts / halfLifeMs
            m = m.updated(b, m.getOrElse(b, 0L) + 1L)
            changed = true
          }
          if (!changed) Iterator.empty
          else {
            val mx = m.keys.max
            m = m.filter { case (b, _) => b > mx - keep }
            seq += 1
            state.update((m, seq))
            m.toSeq.sortBy(_._1)
              .map { case (b, n) => BucketRow(item, b, n, seq) }.iterator
          }
      }
  }

  /** Serve top-`k` from a bucket-count table (batch output or the
    * freshest stream emission): exact integer decay against the GLOBAL
    * max bucket. */
  def trendingFromBuckets(bucketCounts: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "trending: k >= 1")
    val gm = bucketCounts.agg(max("bucket").as("g"))
    bucketCounts.crossJoin(broadcast(gm))
      .groupBy("item_id")
      .agg(sum(expr(
        "n * (1000000L div shiftleft(1L, cast(least(g - bucket, 40L) as int)))"))
        .as("score_e6"),
        sum("n").as("n"))
      .orderBy(col("score_e6").desc, col("item_id"))
      .limit(k)
  }
}
