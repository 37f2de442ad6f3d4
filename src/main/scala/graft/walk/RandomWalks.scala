package graft.walk

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed random-walk kernel (SURVEY §2.8 M1/M2).
  *
  * The reference calls the `graph-walker` library (or its vendored
  * fallback `framework/recommender/utils/walker.py:12-55`): `n_walks`
  * truncated uniform walks of length `walkLen` from EVERY node; a walk
  * stops early at a node with no neighbors (walker.py:37-39). The
  * node2vec variant (walker.py:103-185) biases step probabilities by
  * return parameter p and in-out parameter q.
  *
  * Spark shape: adjacency lists `(node, nbrs: array)` built once
  * (one shuffle); walk state is a DataFrame advanced by `walkLen - 1`
  * broadcast-or-shuffle joins against the adjacency. Randomness is a
  * pure function xxhash64(start, walkIdx, step, seed) — deterministic
  * under retries and any partitioning (SURVEY §4.5).
  *
  * The biased step weights cost O(degree²) per extension through the
  * prefix-sum HOF; fine for the graph sizes the reference targets. The
  * 100 TB path would precompute per-edge alias tables — documented,
  * not needed for parity.
  */
object RandomWalks {

  /** Undirected adjacency: (node, nbrs sorted asc) from an edge list
    * (src, dst). Sorting makes neighbor indexing deterministic. */
  def adjacency(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .groupBy(col("src").as("node"))
      .agg(sort_array(collect_list("dst")).as("nbrs"))

  private def hash01(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(cols: _*), lit(1000000007L)).cast("double") / 1000000007.0)

  /** Uniform walks. nodes: (node) — every start node (walks from
    * isolated nodes are the single-node path, matching walker.py:30-39).
    * Returns (start, walk_idx, path: array<long>). */
  def randomWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, seed: Long): DataFrame = {
    var state = nodes.select(col("node").as("start"))
      .crossJoin(spark.range(nWalks).select(col("id").as("walk_idx")))
      .withColumn("path", array(col("start")))
      .withColumn("cur", col("start"))
    for (step <- 1 until walkLen) {
      state = state.join(broadcast(adj), state("cur") === adj("node"), "left")
        .withColumn("nxt",
          when(col("nbrs").isNotNull && size(col("nbrs")) > 0,
            element_at(col("nbrs"),
              (pmod(xxhash64(col("start"), col("walk_idx"), lit(step), lit(seed)),
                size(col("nbrs")).cast("long")) + 1).cast("int"))))
        .select(col("start"), col("walk_idx"),
          when(col("nxt").isNotNull, concat(col("path"), array(col("nxt"))))
            .otherwise(col("path")).as("path"),
          col("nxt").as("cur"))
      if (step % 4 == 0) state = state.localCheckpoint(eager = false)
    }
    state.select("start", "walk_idx", "path")
  }

  /** Second-order (node2vec) walks: step weight 1/p back to the
    * previous node, 1 to a neighbor of the previous node, 1/q otherwise
    * (walker.py:148-155). */
  def biasedWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, p: Double, q: Double, seed: Long): DataFrame = {
    val prevAdj = adj.select(col("node").as("prev_node"), col("nbrs").as("prev_nbrs"))
    var state = nodes.select(col("node").as("start"))
      .crossJoin(spark.range(nWalks).select(col("id").as("walk_idx")))
      .withColumn("path", array(col("start")))
      .withColumn("cur", col("start"))
      .withColumn("prev", lit(null).cast("long"))
    for (step <- 1 until walkLen) {
      val r = hash01(col("start"), col("walk_idx"), lit(step), lit(seed))
      state = state
        .join(broadcast(adj), state("cur") === adj("node"), "left")
        .join(broadcast(prevAdj), state("prev") === prevAdj("prev_node"), "left")
        .withColumn("wts",
          when(col("prev").isNull, expr("transform(nbrs, x -> cast(1.0 as double))"))
            .otherwise(expr(
              s"transform(nbrs, x -> CASE WHEN x = prev THEN ${1.0 / p}" +
                s" WHEN prev_nbrs IS NOT NULL AND array_contains(prev_nbrs, x) THEN 1.0" +
                s" ELSE ${1.0 / q} END)")))
        .withColumn("total", expr("aggregate(wts, cast(0.0 as double), (a, v) -> a + v)"))
        .withColumn("target", r * col("total"))
        // first index whose running prefix sum exceeds the target draw
        .withColumn("pick",
          expr("""size(filter(transform(sequence(1, size(wts)),
                 i -> aggregate(slice(wts, 1, i), cast(0.0 as double), (a, v) -> a + v)),
                 c -> c <= target)) + 1"""))
        .withColumn("nxt",
          when(col("nbrs").isNotNull && size(col("nbrs")) > 0,
            element_at(col("nbrs"), least(col("pick"), size(col("nbrs"))).cast("int"))))
        .select(col("start"), col("walk_idx"),
          when(col("nxt").isNotNull, concat(col("path"), array(col("nxt"))))
            .otherwise(col("path")).as("path"),
          col("nxt").as("cur"),
          when(col("nxt").isNotNull, col("cur")).otherwise(lit(null).cast("long")).as("prev"))
      if (step % 4 == 0) state = state.localCheckpoint(eager = false)
    }
    state.select("start", "walk_idx", "path")
  }
}
