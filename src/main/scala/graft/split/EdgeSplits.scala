package graft.split

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The four rating-edge split strategies of the reference's
  * `framework/dataloader/edge_splitter/edge_splitter.py`, re-expressed
  * as deterministic fold/test *assignment columns* over an immutable
  * rating DataFrame (the reference deep-copies and mutates an nx.Graph
  * per fold — edge_splitter.py:17,75-83; here train is simply the
  * complement filter, so folds cost nothing to "restore").
  *
  * Determinism: NumPy's shuffle order cannot be reproduced on the JVM,
  * so "random" ordering is defined as seeded xxhash64(user, item, seed)
  * — a pure function of the edge, stable across retries, partitionings
  * and cluster sizes (SURVEY §4.5). Oracle tests may instead pass an
  * explicit deterministic `orderKey` so DuckDB can replay the split.
  */
object EdgeSplits {

  /** Seeded pseudo-random ordering key for an edge. */
  def edgeHash(seed: Long): Column =
    xxhash64(col("user_id"), col("item_id"), lit(seed))

  /** Oracle-portable seeded ordering key: md5 over an explicit string,
    * reproducible verbatim in DuckDB SQL (xxhash64 is JVM-only). */
  def portableHash(seed: Long): Column =
    md5(concat_ws("|", col("user_id"), col("item_id"), lit(seed)))

  private def rankWindows(level: String, orderKey: Seq[Column]) = {
    val part = level match {
      case "user"   => Window.partitionBy("user_id")
      case "global" => Window.partitionBy() // exactness over scale; see scaladoc below
      case other    => throw new IllegalArgumentException(s"level must be user|global, got $other")
    }
    (part.orderBy(orderKey: _*), part)
  }

  /** Shared ratio machinery for W1-W3: order edges (globally or per
    * user), mark the last ceil(n*p) as test (edge_splitter.py:85-119).
    *
    * Note on `level = "global"`: an exact global ceil(N*p) cutoff needs
    * a total order, which Spark can only give through a single-partition
    * window — fine at verification scale. The scale path for 100 TB is
    * [[byRatioApprox]], which replaces the global row_number with an
    * approxQuantile threshold on the ordering key.
    */
  def byRatio(ratings: DataFrame, p: Double, level: String, orderKey: Seq[Column]): DataFrame = {
    require(p > 0 && p < 1, s"p must be in (0,1), got $p") // edge_splitter.py:36-37
    val (rankW, countW) = rankWindows(level, orderKey)
    ratings
      .withColumn("__rn", row_number().over(rankW))
      .withColumn("__n", count(lit(1)).over(countW))
      .withColumn("is_test", col("__rn") > col("__n") - ceil(col("__n") * p))
      .drop("__rn", "__n")
  }

  /** W1/W2 `random_by_ratio` with seeded-hash order (edge_splitter.py:85-101). */
  def randomByRatio(ratings: DataFrame, p: Double, level: String, seed: Long): DataFrame =
    byRatio(ratings, p, level, Seq(edgeHash(seed), col("item_id")))

  /** W3 `timestamp_by_ratio`: most recent ceil(n*p) edges are test
    * (edge_splitter.py:103-119). Ties broken by item then user id so the
    * assignment is a pure function of the edge. */
  def timestampByRatio(ratings: DataFrame, p: Double, level: String): DataFrame =
    byRatio(ratings, p, level, Seq(col("ts"), col("item_id"), col("user_id")))

  /** Scale-path variant of the global ratio split: threshold the ordering
    * column at its (1-p) quantile instead of a total order. Approximate
    * in the cut position (relativeError), exact in monotonicity. */
  def byRatioApprox(ratings: DataFrame, p: Double, orderCol: String,
                    relativeError: Double = 0.001): DataFrame = {
    val thr = ratings.stat.approxQuantile(orderCol, Array(1 - p), relativeError).head
    ratings.withColumn("is_test", col(orderCol) > lit(thr))
  }

  /** W4 `fixed_timestamp`: test = edges with ts strictly greater than t
    * (edge_splitter.py:52-60). No shuffle at all — a pushed-down filter. */
  def fixedTimestamp(ratings: DataFrame, t: Long): DataFrame =
    ratings.withColumn("is_test", col("ts") > t)

  /** W5/W6 `k_fold`: contiguous blocks of the (shuffled) order become
    * folds (edge_splitter.py:121-151). sklearn.KFold hands the first
    * N mod k folds one extra element — exactly ntile(k) semantics.
    * Returns a `fold` column in 1..k; fold i test = (fold === i).
    */
  def kFold(ratings: DataFrame, k: Int, level: String, orderKey: Seq[Column]): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k") // edge_splitter.py:63-64
    val (rankW, _) = rankWindows(level, orderKey)
    ratings.withColumn("fold", ntile(k).over(rankW))
  }

  /** Seeded-hash-ordered k-fold (the default "random" flavor). */
  def kFoldRandom(ratings: DataFrame, k: Int, level: String, seed: Long): DataFrame =
    kFold(ratings, k, level, Seq(edgeHash(seed), col("item_id")))
}
