package graft.model

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Shared dot-product serving for the matrix-factorization family
  * ([[BprMf]], [[Als]]): score every (user, item) as `p·q (+ bias)`
  * against a broadcast item matrix with a bounded per-user heap of
  * size `k + maxRated` (the [[graft.walk.DeepWalkRecommender]] k'
  * trick guarantees ≥ k unseen survivors), anti-join the seen pairs,
  * rank ≤ k. Requires the item matrix to broadcast (≤ ~2M items at
  * d=16); larger catalogs serve through the ANN index family
  * (SrpLsh/IVF) instead.
  */
private[model] object MfServing {

  /** @param pDf     user factors (id, vec)
    * @param qArr    item factor matrix indexed by dense id
    * @param d       factor width used for the dot product
    * @param bias    score starts at `q(d)` (a trailing bias slot)
    *                instead of 0
    * @param dense   seen (u, i) pairs
    * @param uIdx    (user_id, u) dense user index
    * @param iIdx    (item_id, i) dense item index
    * @return (user_id, item_id, rank) — (score desc, item_id) tie-break */
  def topKRecs(spark: SparkSession, pDf: DataFrame, qArr: Array[Array[Float]],
               d: Int, bias: Boolean, dense: DataFrame,
               uIdx: DataFrame, iIdx: DataFrame, k: Int): DataFrame = {
    val bcQ = spark.sparkContext.broadcast(qArr)
    val maxRated = dense.groupBy("u").agg(count(lit(1)).as("c"))
      .agg(max("c")).first().getLong(0).toInt
    val kPrime = math.min(k + maxRated, qArr.length)
    import spark.implicits._
    val topRaw = pDf.as[(Int, Array[Float])].mapPartitions { it =>
      val qq = bcQ.value
      it.flatMap { case (u, pv) =>
        // bounded heap of size kPrime; deterministic (score desc, item asc)
        val ord = Ordering.by[(Float, Int), (Float, Int)] { case (s, i) => (-s, i) }
        val heap = mutable.PriorityQueue.empty[(Float, Int)](ord) // head = current worst
        var i = 0
        while (i < qq.length) {
          val qv = qq(i)
          var s = if (bias) qv(d) else 0.0f
          var j = 0
          while (j < d) { s += pv(j) * qv(j); j += 1 }
          if (heap.size < kPrime) heap.enqueue((s, i))
          else {
            val worst = heap.head
            if (s > worst._1 || (s == worst._1 && i < worst._2)) {
              heap.dequeue(); heap.enqueue((s, i))
            }
          }
          i += 1
        }
        heap.iterator.map { case (s, item) => (u, item, s) }
      }
    }.toDF("u", "i", "score")
    topRaw
      .join(dense.select(col("u"), col("i"), lit(1).as("__seen")), Seq("u", "i"), "left")
      .filter(col("__seen").isNull)
      .withColumn("rank", row_number().over(
        Window.partitionBy("u").orderBy(col("score").desc, col("i"))))
      .filter(col("rank") <= k)
      .join(uIdx, Seq("u")).join(iIdx, Seq("i"))
      .select(col("user_id"), col("item_id"), col("rank"))
  }

  /** Dense-index a rating frame's positive pairs: (pos, uIdx, iIdx,
    * dense) with the three frames persisted — caller must unpersist
    * after materializing downstream output. */
  def denseIds(ratings: DataFrame, minRating: Double):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val pos = ratings.filter(col("rating") >= minRating)
      .select(col("user_id"), col("item_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uIdx = graft.util.DenseIndex.byKey(pos.select("user_id").distinct(), "user_id")
      .select(col("user_id"), (col("idx") - 1).cast("int").as("u"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val iIdx = graft.util.DenseIndex.byKey(pos.select("item_id").distinct(), "item_id")
      .select(col("item_id"), (col("idx") - 1).cast("int").as("i"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dense = pos.join(uIdx, Seq("user_id")).join(iIdx, Seq("item_id"))
      .select("u", "i")
    (pos, uIdx, iIdx, dense)
  }
}
