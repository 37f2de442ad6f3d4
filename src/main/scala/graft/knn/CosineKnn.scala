package graft.knn

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact and approximate top-k cosine-similarity joins (SURVEY §2.3 J6).
  *
  * The reference does brute-force cosine kNN with sklearn
  * (`deep_walk_based/model.py:54-80`, `transE/model.py:137-155`). The
  * exact variant here is the distributed equivalent: broadcast the item
  * side, score with a codegen'd higher-order-function dot product, rank
  * per query with a window. The item side of a recommender is the small
  * side (items << users at web scale); queries never shuffle — only the
  * final per-query window partitions by query id.
  *
  * [[approxTopK]] is the 100 TB path: BucketedRandomProjectionLSH over
  * L2-normalized vectors (Euclidean distance on the unit sphere is a
  * monotone transform of cosine distance: d² = 2 − 2·cos). Flagged, not
  * default — oracle tests pin the exact variant.
  */
object CosineKnn {

  /** Sum of elementwise products, accumulated left-to-right in index
    * order (bit-reproducible across partitionings). Backed by the
    * codegen'd [[graft.functions.ArrayDot]] — the HOF formulation
    * (aggregate over zip_with) allocates an intermediate array per row,
    * which dominates O(n²) similarity joins. */
  def dot(a: String, b: String): org.apache.spark.sql.Column =
    graft.functions.ArrayDot(col(a), col(b))

  def l2norm(a: String): org.apache.spark.sql.Column =
    sqrt(graft.functions.ArrayDot(col(a), col(a)))

  /** queries/items: (id, vec: array<double>). Output:
    * (query_id, item_id, score, rank) with rank 1..k by cosine
    * similarity desc, ties broken by item id (deterministic). Self-pairs
    * are excluded when `excludeSelf`.
    *
    * Physical strategy: the relational form (crossJoin(broadcast) +
    * ranking window) materializes an N×M row stream where EVERY row
    * carries both dim-sized vectors — ~75 GB of row traffic for 1.5k
    * users × 20k items × 150 dims, memory-bandwidth-bound regardless of
    * parallelism. The fast path broadcasts the item matrix as primitive
    * arrays and runs a fused score-and-select loop per query partition
    * (a bounded worst-first heap), emitting only the top-k rows — same
    * accumulation order, same tie-break, bit-identical scores. Falls
    * back to the relational plan for id types without a pinned ordering.
    */
  def topK(queries: DataFrame, items: DataFrame, k: Int, excludeSelf: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types._
    val idType = queries.schema("id").dataType
    val fastIdOk = idType == items.schema("id").dataType && (idType match {
      case LongType | IntegerType | StringType | DoubleType => true
      case _ => false
    })
    if (fastIdOk) topKCompute(queries, items, k, excludeSelf, idType)
    else topKRelational(queries, items, k, excludeSelf)
  }

  private def topKCompute(queries: DataFrame, items: DataFrame, k: Int,
                          excludeSelf: Boolean,
                          idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.Row
    val spark = queries.sparkSession
    // item matrix, pre-sorted by id so (score desc, index asc) ranks
    // exactly like (score desc, item_id asc) — Spark's orderBy uses the
    // same binary/numeric collation as the ranking window would
    val itemRows = items.select(col("id"), col("vec")).orderBy("id").collect()
    val itemIds = itemRows.map(_.get(0))
    val itemVecs = itemRows.map(_.getSeq[Double](1).toArray)
    val itemNorms = itemVecs.map { v =>
      var s = 0.0; var i = 0; while (i < v.length) { s += v(i) * v(i); i += 1 }; math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((itemIds, itemVecs, itemNorms))
    val sc = spark.sparkContext
    val parts = math.max(sc.defaultParallelism, queries.rdd.getNumPartitions)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .repartition(parts, col("query_id"))
    // worst-kept-first ordering: the PQ dequeues its "greatest", which we
    // define as the worst candidate under (score desc, idx asc)
    val worseGreater: Ordering[(Double, Int)] = new Ordering[(Double, Int)] {
      def compare(a: (Double, Int), b: (Double, Int)): Int = {
        val c = java.lang.Double.compare(b._1, a._1)
        if (c != 0) c else java.lang.Integer.compare(a._2, b._2)
      }
    }
    val out = q.rdd.mapPartitions { it =>
      val (ids, vecs, norms) = bc.value
      val m = ids.length
      it.flatMap { r =>
        val qid = r.get(0)
        val qs = r.getSeq[Double](1)
        val qv = new Array[Double](qs.length)
        var i = 0; while (i < qv.length) { qv(i) = qs(i); i += 1 }
        var qn = 0.0; i = 0; while (i < qv.length) { qn += qv(i) * qv(i); i += 1 }
        qn = math.sqrt(qn)
        val heap = new scala.collection.mutable.PriorityQueue[(Double, Int)]()(worseGreater)
        var idx = 0
        while (idx < m) {
          if (!(excludeSelf && ids(idx) == qid)) {
            val iv = vecs(idx)
            val n = math.min(qv.length, iv.length)
            var dot = 0.0; var j = 0
            while (j < n) { dot += qv(j) * iv(j); j += 1 }
            val denom = qn * norms(idx)
            // zero vectors (F14 zero-fill) score below any true cosine
            val score = if (denom > 0) dot / denom else -2.0
            if (heap.size < k) heap.enqueue((score, idx))
            else {
              val worst = heap.head
              if (worseGreater.compare((score, idx), worst) < 0) {
                heap.dequeue(); heap.enqueue((score, idx))
              }
            }
          }
          idx += 1
        }
        val best: Seq[(Double, Int)] = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case ((score, ix), rank) =>
          Row(qid, ids(ix), score, rank + 1)
        }
      }
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("query_id", idType), StructField("item_id", idType),
      StructField("score", DoubleType), StructField("rank", IntegerType, nullable = false))))
  }

  /** Relational fallback (also the reference plan shape for the docs):
    * crossJoin(broadcast) + ranking window. Queries are spread and
    * hash-partitioned by query_id so the window needs no exchange of the
    * scored N×M rows. */
  private[graft] def topKRelational(queries: DataFrame, items: DataFrame, k: Int,
                                  excludeSelf: Boolean): DataFrame = {
    val sc = queries.sparkSession.sparkContext
    val parts = math.max(sc.defaultParallelism, queries.rdd.getNumPartitions)
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
      .repartition(parts, col("query_id"))
      .withColumn("qn", l2norm("qv"))
    val it = items.select(col("id").as("item_id"), col("vec").as("iv"))
      .withColumn("in", l2norm("iv"))
    val scored = q.crossJoin(broadcast(it))
      .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
      // zero vectors (F14 zero-fill) score below any true cosine (< -1)
      .withColumn("score",
        when(col("qn") * col("in") > 0, dot("qv", "iv") / (col("qn") * col("in")))
          .otherwise(lit(-2.0)))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "score", "rank")
  }

  /** Approximate variant for item sides too large to broadcast:
    * LSH-bucketed join on normalized vectors, then exact re-rank within
    * the candidate set. `oversample` widens recall. */
  def approxTopK(queries: DataFrame, items: DataFrame, k: Int,
                 bucketLength: Double = 1.0, numHashTables: Int = 2,
                 distThreshold: Double = 1.4): DataFrame = {
    def normalized(df: DataFrame, idCol: String) = df.select(
      col("id").as(idCol),
      array_to_vector(expr("transform(vec, x -> x / sqrt(aggregate(vec, cast(0.0 as double), (a, v) -> a + v * v)))"))
        .as("features"))
    val q = normalized(queries, "query_id")
    val it = normalized(items, "item_id")
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(it)
    val joined = model.approxSimilarityJoin(q, it, distThreshold, "dist")
      .select(col("datasetA.query_id").as("query_id"),
        col("datasetB.item_id").as("item_id"),
        // cos = 1 - d²/2 for unit vectors
        (lit(1.0) - col("dist") * col("dist") / 2.0).as("score"))
    joined
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
      .filter(col("rank") <= k)
  }
}
