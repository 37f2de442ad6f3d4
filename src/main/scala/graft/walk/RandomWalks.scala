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
    // the node table often arrives single-partition (relabel's exact
    // path); without a spread the ENTIRE walk loop — every step's
    // broadcast join — runs in one task
    var state = nodes.select(col("node").as("start"))
      .repartition(spark.sparkContext.defaultParallelism)
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
    * (walker.py:148-155).
    *
    * Sampling trick: the weight vector only ever holds three values, so
    * instead of an O(degree²) per-row prefix-sum over all neighbors we
    * sample the CLASS (back / common / far) by its total mass, then
    * pick uniformly inside the class — O(degree) set algebra per step,
    * distribution-identical to the reference's piecewise weights. */
  def biasedWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, p: Double, q: Double, seed: Long): DataFrame = {
    // p == q == 1 makes every class weight 1: the biased distribution IS
    // uniform, so skip the per-step O(degree) set algebra entirely —
    // against hub nodes (a popular item's neighbor list is the user
    // dimension) that algebra dominates the whole walk loop
    if (p == 1.0 && q == 1.0) return randomWalks(spark, adj, nodes, nWalks, walkLen, seed)
    val prevAdj = adj.select(col("node").as("prev_node"), col("nbrs").as("prev_nbrs"))
    // the node table often arrives single-partition (relabel's exact
    // path); without a spread the ENTIRE walk loop — every step's
    // broadcast join — runs in one task
    var state = nodes.select(col("node").as("start"))
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(spark.range(nWalks).select(col("id").as("walk_idx")))
      .withColumn("path", array(col("start")))
      .withColumn("cur", col("start"))
      .withColumn("prev", lit(null).cast("long"))
    for (step <- 1 until walkLen) {
      val r = hash01(col("start"), col("walk_idx"), lit(step), lit(seed))
      val idx = pmod(xxhash64(col("start"), col("walk_idx"), lit(step), lit(seed + 1)), lit(1000000007L))
      state = state
        .join(broadcast(adj), state("cur") === adj("node"), "left")
        .join(broadcast(prevAdj), state("prev") === prevAdj("prev_node"), "left")
        // class decomposition of the neighbor set wrt the previous node
        .withColumn("common",
          when(col("prev").isNull, expr("array()"))
            .otherwise(expr("array_remove(array_intersect(nbrs, coalesce(prev_nbrs, array())), prev)")))
        .withColumn("far",
          when(col("prev").isNull, col("nbrs"))
            .otherwise(expr("array_except(array_remove(nbrs, prev), common)")))
        .withColumn("w_back",
          when(col("prev").isNotNull && expr("array_contains(nbrs, prev)"), lit(1.0 / p))
            .otherwise(lit(0.0)))
        .withColumn("w_common", when(col("prev").isNull, lit(0.0))
          .otherwise(size(col("common")).cast("double")))
        .withColumn("w_far", size(col("far")).cast("double") *
          when(col("prev").isNull, lit(1.0)).otherwise(lit(1.0 / q)))
        .withColumn("draw", r * (col("w_back") + col("w_common") + col("w_far")))
        .withColumn("nxt",
          when(col("nbrs").isNull || size(col("nbrs")) === 0, lit(null).cast("long"))
            .when(col("draw") < col("w_back"), col("prev"))
            .when(col("draw") < col("w_back") + col("w_common"),
              element_at(col("common"), (idx % greatest(size(col("common")), lit(1)) + 1).cast("int")))
            .otherwise(
              element_at(col("far"), (idx % greatest(size(col("far")), lit(1)) + 1).cast("int"))))
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
