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
    * are excluded when `excludeSelf`. */
  def topK(queries: DataFrame, items: DataFrame, k: Int, excludeSelf: Boolean = false): DataFrame = {
    val q = queries.select(col("id").as("query_id"), col("vec").as("qv"))
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
