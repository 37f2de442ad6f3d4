package graft.prep

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Graph preprocessing operators mirroring the reference's
  * `framework/dataloader/preprocess/methods.py`.
  */
object Preprocess {

  /** Binarize ratings: `rating >= threshold -> 1.0 else 0.0`
    * (methods.py:17-26). Pure column expression — codegen'd, no shuffle. */
  def binarize(ratings: DataFrame, threshold: Double): DataFrame =
    ratings.withColumn(
      "rating",
      when(col("rating") >= threshold, 1.0).otherwise(0.0))

  /** Reference k-core (methods.py:28-47): for up to `iterations` rounds,
    * compute per-target degree on a SNAPSHOT of the current edge set,
    * drop every target node with degree < k, stop early when a round
    * removes nothing. This is deliberately NOT textbook k-core
    * decomposition: removals within one round do not cascade until the
    * next round's snapshot (methods.py:35-37).
    *
    * target = "user" | "item". Each round is ONE aggregation job: the
    * kill set is persisted and its count() serves both the convergence
    * check and (via the cache) the anti-join input — no second pass over
    * the edge lineage. No broadcast hint on the join: on early rounds of
    * a large run most nodes fail the degree test, so the "tiny" kill set
    * can approach the full node dimension; AQE picks broadcast vs
    * shuffle from the actual materialized size.
    */
  def filterKCore(ratings: DataFrame, k: Int, target: String, iterations: Int = 1): DataFrame = {
    val key = target match {
      case "user" => "user_id"
      case "item" => "item_id"
      case other  => throw new IllegalArgumentException(s"k-core target must be user|item, got $other")
    }
    var cur = ratings
    var it = 0
    var converged = false
    val kills = scala.collection.mutable.Buffer.empty[DataFrame]
    val curPersists = scala.collection.mutable.Buffer.empty[DataFrame]
    while (it < iterations && !converged) {
      val kill = cur.groupBy(key).count().filter(col("count") < k).select(key)
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (kill.count() == 0L) { converged = true; kill.unpersist() }
      else { kills += kill; cur = cur.join(kill, Seq(key), "left_anti") }
      it += 1
      // reference configs run 1-3 iterations: recomputing the shallow
      // anti-join lineage beats materializing each round; deep loops
      // get their lineage truncated periodically
      if (it % 4 == 0) { cur = cur.persist(StorageLevel.MEMORY_AND_DISK); curPersists += cur }
    }
    if (kills.isEmpty) cur
    else {
      // materialize the surviving edge set once, then release every
      // per-round kill cache and intermediate lineage truncation —
      // iterative loops must not accumulate session-long storage
      val out = cur.persist(StorageLevel.MEMORY_AND_DISK)
      out.count()
      kills.foreach(_.unpersist(blocking = false))
      curPersists.filter(_ ne out).foreach(_.unpersist(blocking = false))
      out
    }
  }
}
