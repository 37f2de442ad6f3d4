package graft.util

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** EXACT heavy hitters without a full shuffle on the raw key — the
  * hot-token / hot-domain / hot-user detector for corpus observability
  * at 100 TB, where the key universe (URLs, tokens) has billions of
  * distinct values and a plain groupBy(key) would shuffle all of them.
  *
  * Two passes:
  *   1. A narrow per-partition Misra-Gries summary of capacity `m`.
  *      Averaging argument: if an item's global frequency exceeds
  *      n/(m+1), some partition holds it with local frequency above
  *      n_p/(m+1), and MG with capacity m retains any such item with a
  *      positive counter — so the union of partition survivors is a
  *      guaranteed superset of every item with count*(m+1) > n. At
  *      most m * numPartitions candidates exist, so collecting them to
  *      the driver is size-gated BY CONSTRUCTION (m=50 on 1000
  *      executors x 32 partitions is 1.6M strings worst-case; typical
  *      is far less because partitions agree on the hot keys).
  *   2. An exact recount of candidates only: an InSet filter (no join,
  *      no broadcast exchange) + groupBy. Partial aggregation collapses
  *      the heavy rows map-side, so the final exchange carries at most
  *      candidates * partitions skinny rows.
  *
  * The result (every key with count*(m+1) > n, with its exact count)
  * is deterministic — MG affects only WHICH extra candidates survive
  * pass 1, never the final answer — so a plain GROUP BY/HAVING replays
  * it in any engine.
  */
object HeavyHitters {

  /** Keys of string column `keyCol` with count*(m+1) > n (strict, n =
    * non-null row count), with exact counts. Columns: (key, cnt). */
  def exact(df: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m > 0, "heavyHitters: m > 0")
    val keys = df.select(col(keyCol).cast("string")).na.drop()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val candidates: Array[String] = keys
        .mapPartitions { it =>
          val acc = new scala.collection.mutable.HashMap[String, Long]
          it.foreach { row =>
            val k = row.getString(0)
            acc.get(k) match {
              case Some(c) => acc(k) = c + 1
              case None if acc.size < m => acc(k) = 1L
              case None => // decrement-all MG step; drop zeros
                val dead = new scala.collection.mutable.ArrayBuffer[String]
                acc.foreach { case (kk, c) =>
                  if (c == 1L) dead += kk else acc(kk) = c - 1
                }
                dead.foreach(acc.remove)
            }
          }
          acc.keysIterator
        }(Encoders.STRING)
        .distinct().collect()
      val n = keys.count()
      // a decrement-heavy stream can end a partition's summary EMPTY
      // (e.g. strict a,b alternation at m=1) — by the MG guarantee that
      // only happens when no key clears the threshold, so the empty
      // result is correct; the guard just avoids a zero-arg isin
      if (candidates.isEmpty)
        keys.limit(0).groupBy(col(keyCol).as("key"))
          .agg(count(lit(1)).as("cnt"))
      else keys
        .filter(col(keyCol).isin(candidates.toIndexedSeq: _*))
        .groupBy(col(keyCol).as("key"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * (m + 1) > n)
    } finally keys.unpersist(blocking = false)
  }
}
