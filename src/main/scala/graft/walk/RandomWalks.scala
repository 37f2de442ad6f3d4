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
      // collect_set dedups inside the aggregation (with map-side partial
      // combine) — a separate distinct() would pay a second shuffle on
      // the same key
      .groupBy(col("src").as("node"))
      .agg(sort_array(collect_set("dst")).as("nbrs"))

  private def hash01(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    (pmod(xxhash64(cols: _*), lit(1000000007L)).cast("double") / 1000000007.0)

  /** Uniform walks. nodes: (node) — every start node (walks from
    * isolated nodes are the single-node path, matching walker.py:30-39).
    * Returns (start, walk_idx, path: array<long>). */
  private[graft] def randomWalksJoins(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
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
  private[graft] def biasedWalksJoins(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, p: Double, q: Double, seed: Long): DataFrame = {
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

  // ---- broadcast-local kernel -----------------------------------------

  /** SQL-chain-compatible xxhash64: the join kernels draw from
    * `xxhash64(start, walk_idx, lit(step), lit(salt))` (long, long, int,
    * long children, initial seed 42) — this replays the exact chain so
    * both kernels realize IDENTICAL walks and the q42 golden is
    * dispatch-independent. */
  @inline private def stepHash(start: Long, walkIdx: Long, step: Int, salt: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    var h = 42L
    h = XXH64.hashLong(start, h)
    h = XXH64.hashLong(walkIdx, h)
    h = XXH64.hashInt(step, h)
    XXH64.hashLong(salt, h)
  }
  @inline private def pmodL(a: Long, b: Long): Long = { val m = a % b; if (m < 0) m + b else m }

  /** Number of adjacency entries (nodes + directed edge slots) — the
    * dispatch metric for local vs join execution. */
  private def adjEntries(adj: DataFrame): Long =
    adj.agg((count(lit(1)) + coalesce(sum(size(col("nbrs"))), lit(0L))).as("n"))
      .first().getLong(0)

  private def collectAdj(adj: DataFrame): scala.collection.Map[Long, Array[Long]] =
    adj.select(col("node").cast("long"), col("nbrs")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  private val walkSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("start", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("walk_idx", org.apache.spark.sql.types.LongType, nullable = false),
    org.apache.spark.sql.types.StructField("path",
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, containsNull = false))))

  /** One mapPartitions pass computes every step of every walk against a
    * broadcast adjacency — no per-step joins, no intermediate state
    * DataFrames. `stepFn(start, walkIdx, step, path, cur, prev)` returns
    * the next node or None (walk stops, walker.py:37-39). */
  private def localWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame, nWalks: Int,
                         walkLen: Int)(
      stepFn: (scala.collection.Map[Long, Array[Long]], Long, Long, Int, Long, Long) => Option[Long])
      : DataFrame = {
    val bc = spark.sparkContext.broadcast(collectAdj(adj))
    val starts = nodes.select(col("node").cast("long"))
      .repartition(spark.sparkContext.defaultParallelism)
    val rows = starts.rdd.mapPartitions { it =>
      val adjMap = bc.value
      it.flatMap { r =>
        val start = r.getLong(0)
        (0L until nWalks.toLong).iterator.map { w =>
          val path = scala.collection.mutable.ArrayBuffer[Long](start)
          var cur = start
          var prev = -1L // sentinel: no previous node
          var step = 1
          var alive = true
          while (alive && step < walkLen) {
            stepFn(adjMap, start, w, step, cur, prev) match {
              case Some(nxt) => path += nxt; prev = cur; cur = nxt
              case None      => alive = false
            }
            step += 1
          }
          org.apache.spark.sql.Row(start, w, path.toSeq)
        }
      }
    }
    spark.createDataFrame(rows, walkSchema)
  }

  /** Uniform walks. nodes: (node) — every start node (walks from
    * isolated nodes are the single-node path, matching walker.py:30-39).
    * Returns (start, walk_idx, path: array<long>).
    *
    * Dispatch: when the adjacency fits executor memory (the regime the
    * join kernel ALREADY assumed by broadcasting it every step), a
    * single mapPartitions pass computes all steps locally; larger graphs
    * fall back to the per-step join kernel. Walks are bit-identical
    * either way (same hash chain). */
  def randomWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, seed: Long,
                  maxLocalAdjEntries: Long = 5000000L): DataFrame = {
    if (adjEntries(adj) > maxLocalAdjEntries)
      return randomWalksJoins(spark, adj, nodes, nWalks, walkLen, seed)
    localWalks(spark, adj, nodes, nWalks, walkLen) { (adjMap, start, w, step, cur, _) =>
      adjMap.get(cur).filter(_.nonEmpty).map { nbrs =>
        nbrs(pmodL(stepHash(start, w, step, seed), nbrs.length.toLong).toInt)
      }
    }
  }

  /** Second-order (node2vec) walks — see [[biasedWalksJoins]] for the
    * class-sampling scheme. p == q == 1 collapses to uniform sampling
    * (every class weight is 1), which skips the per-step set algebra
    * entirely. Same local-vs-join dispatch as [[randomWalks]]. */
  def biasedWalks(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                  nWalks: Int, walkLen: Int, p: Double, q: Double, seed: Long,
                  maxLocalAdjEntries: Long = 5000000L): DataFrame = {
    if (p == 1.0 && q == 1.0)
      return randomWalks(spark, adj, nodes, nWalks, walkLen, seed, maxLocalAdjEntries)
    if (adjEntries(adj) > maxLocalAdjEntries)
      return biasedWalksJoins(spark, adj, nodes, nWalks, walkLen, p, q, seed)
    localWalks(spark, adj, nodes, nWalks, walkLen) { (adjMap, start, w, step, cur, prev) =>
      adjMap.get(cur).filter(_.nonEmpty).flatMap { nbrs =>
        if (step == 1) {
          // first step: no previous node — uniform over all neighbors
          // (w_back = w_common = 0 in the join kernel's formulation)
          val idx = pmodL(stepHash(start, w, step, seed + 1), 1000000007L)
          Some(nbrs((idx % math.max(nbrs.length, 1)).toInt))
        } else {
          val prevNbrs = adjMap.getOrElse(prev, Array.empty[Long])
          val prevSet = prevNbrs.toSet
          // array_intersect keeps first-array order; array_remove(prev)
          val common = nbrs.filter(x => x != prev && prevSet.contains(x))
          val commonSet = common.toSet
          // array_except(array_remove(nbrs, prev), common)
          val far = nbrs.filter(x => x != prev && !commonSet.contains(x))
          val wBack = if (nbrs.contains(prev)) 1.0 / p else 0.0
          val wCommon = common.length.toDouble
          val wFar = far.length.toDouble * (1.0 / q)
          val r = pmodL(stepHash(start, w, step, seed), 1000000007L).toDouble / 1000000007.0
          val draw = r * (wBack + wCommon + wFar)
          val idx = pmodL(stepHash(start, w, step, seed + 1), 1000000007L)
          if (draw < wBack) Some(prev)
          else if (draw < wBack + wCommon)
            Some(common((idx % math.max(common.length, 1)).toInt))
          else if (far.nonEmpty) Some(far((idx % far.length).toInt))
          else None // element_at past an empty class -> null -> walk stops
        }
      }
    }
  }
}
