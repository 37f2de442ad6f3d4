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
  * The biased class-sampling step costs O(degree) set algebra per
  * extension; fine for the graph sizes the reference targets. The
  * extreme-scale path is [[biasedWalksAlias]]: per-directed-edge
  * Walker alias tables (the classic node2vec preprocessing) make every
  * step O(1) — two hash draws and two array reads — at the cost of one
  * O(Σ deg(cur)) distributed precompute, and the per-step join keys on
  * (prev, cur) WITHOUT broadcasting, so neither the tables nor the
  * adjacency ever need to fit on one executor.
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

  // ---- alias-table kernel (extreme-scale biased walks) ----------------

  /** Walker alias construction over a weight vector: O(d) build, O(1)
    * draw. Returns (prob, alias): draw slot j uniformly, take j with
    * probability prob(j), else alias(j). Standard Vose/Walker method
    * (public construction; same scheme as [[graft.walk.SkipGram]]'s
    * negative sampler). */
  private[graft] def buildAlias(w: Array[Double]): (Array[Double], Array[Int]) = {
    val n = w.length
    val sum = w.sum
    // p=0 or q=0 would give 1/p = Infinity → all-NaN scaled weights →
    // a silently UNIFORM table (every slot lands on the `large` stack),
    // the opposite of the intended return-dominated distribution. The
    // class kernels would diverge too (Inf draw mass); fail fast instead.
    require(w.forall(v => java.lang.Double.isFinite(v) && v >= 0) &&
      java.lang.Double.isFinite(sum) && sum > 0,
      s"alias weights must be finite, non-negative, with positive mass (p/q must be > 0); got ${w.mkString(",")}")
    val prob = new Array[Double](n)
    val alias = new Array[Int](n)
    val scaled = w.map(_ * n / sum)
    val small = scala.collection.mutable.Stack[Int]()
    val large = scala.collection.mutable.Stack[Int]()
    // deterministic fill order (ascending index) keeps the tables — and
    // therefore every downstream draw — reproducible across runs
    var i = 0
    while (i < n) { if (scaled(i) < 1.0) small.push(i) else large.push(i); i += 1 }
    while (small.nonEmpty && large.nonEmpty) {
      val s = small.pop(); val l = large.pop()
      prob(s) = scaled(s); alias(s) = l
      scaled(l) = scaled(l) - (1.0 - scaled(s))
      if (scaled(l) < 1.0) small.push(l) else large.push(l)
    }
    while (large.nonEmpty) { val l = large.pop(); prob(l) = 1.0; alias(l) = l }
    while (small.nonEmpty) { val s = small.pop(); prob(s) = 1.0; alias(s) = s }
    (prob, alias)
  }

  /** Per-directed-edge alias tables for the node2vec transition
    * π(next | prev, cur): for every edge (prev → cur), a Walker table
    * over cur's neighbor list under the piecewise weights 1/p back,
    * 1 to a common neighbor, 1/q otherwise (walker.py:148-155). Output
    * (prev, cur, nbrs, prob, alias) stays a DataFrame — O(Σ deg(cur))
    * rows×entries total, shuffled-joined per step, never collected or
    * broadcast: this is what makes the kernel viable when the adjacency
    * itself exceeds executor memory. */
  private[graft] def edgeAliasTables(adj: DataFrame, p: Double, q: Double): DataFrame = {
    val edges = adj.select(col("node").as("prev"), explode(col("nbrs")).as("cur"))
    val curAdj = adj.select(col("node").as("cur"), col("nbrs"))
    val prevAdj = adj.select(col("node").as("prev"), col("nbrs").as("prev_nbrs"))
    val weighted = edges
      .join(curAdj, Seq("cur"))
      .join(prevAdj, Seq("prev"))
      .withColumn("w", expr(
        s"transform(nbrs, x -> CASE WHEN x = prev THEN ${1.0 / p}D " +
          s"WHEN array_contains(prev_nbrs, x) THEN 1.0D ELSE ${1.0 / q}D END)"))
      .select("prev", "cur", "nbrs", "w")
    val buildUdf = udf { w: Seq[Double] =>
      val (prob, alias) = buildAlias(w.toArray)
      (prob.toSeq, alias.toSeq)
    }
    weighted
      .withColumn("pa", buildUdf(col("w")))
      .select(col("prev"), col("cur"), col("nbrs"),
        col("pa._1").as("prob"), col("pa._2").as("alias"))
  }

  /** Second-order walks via precomputed per-edge alias tables — the
    * extreme-scale biased kernel. Each step is O(1): slot = hash mod
    * degree, coin = hash01, next = if coin < prob(slot) nbrs(slot) else
    * nbrs(alias(slot)). Distribution-identical to the class-sampling
    * kernels (same piecewise weights), but a DIFFERENT seeded draw
    * sequence — walks are deterministic for a fixed seed yet not
    * bit-equal to [[biasedWalks]]' output, so the default dispatch keeps
    * the class kernels (the q42 golden pins those) and callers opt in
    * where the per-step set algebra or the broadcast adjacency is the
    * bottleneck. */
  def biasedWalksAlias(spark: SparkSession, adj: DataFrame, nodes: DataFrame,
                       nWalks: Int, walkLen: Int, p: Double, q: Double,
                       seed: Long): DataFrame = {
    val aliasDf = edgeAliasTables(adj, p, q)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var state = nodes.select(col("node").as("start"))
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(spark.range(nWalks).select(col("id").as("walk_idx")))
      .withColumn("path", array(col("start")))
      .withColumn("cur", col("start"))
      .withColumn("prev", lit(null).cast("long"))
    for (step <- 1 until walkLen) {
      val r = hash01(col("start"), col("walk_idx"), lit(step), lit(seed))
      val idx = pmod(xxhash64(col("start"), col("walk_idx"), lit(step), lit(seed + 1)), lit(1000000007L))
      val stepped =
        if (step == 1)
          // no previous node yet: uniform over cur's neighbors (the same
          // first-step rule as both class kernels)
          state.join(adj, state("cur") === adj("node"), "left")
            .withColumn("nxt",
              when(col("nbrs").isNotNull && size(col("nbrs")) > 0,
                element_at(col("nbrs"),
                  (idx % greatest(size(col("nbrs")), lit(1)).cast("long") + 1).cast("int"))))
        else {
          // shuffle join on the walk edge — deliberately NOT broadcast
          val at = aliasDf.select(col("prev").as("a_prev"), col("cur").as("a_cur"),
            col("nbrs"), col("prob"), col("alias"))
          state.join(at,
              state("prev") === at("a_prev") && state("cur") === at("a_cur"), "left")
            .withColumn("slot", (idx % greatest(size(col("nbrs")), lit(1)).cast("long") + 1).cast("int"))
            .withColumn("nxt",
              when(col("nbrs").isNotNull && size(col("nbrs")) > 0,
                when(r < element_at(col("prob"), col("slot")),
                  element_at(col("nbrs"), col("slot")))
                  .otherwise(element_at(col("nbrs"),
                    element_at(col("alias"), col("slot")) + 1))))
        }
      state = stepped.select(col("start"), col("walk_idx"),
        when(col("nxt").isNotNull, concat(col("path"), array(col("nxt"))))
          .otherwise(col("path")).as("path"),
        col("nxt").as("cur"),
        when(col("nxt").isNotNull, col("cur")).otherwise(lit(null).cast("long")).as("prev"))
      if (step % 4 == 0) state = state.localCheckpoint(eager = false)
    }
    // materialize before releasing the alias tables — the walk is done
    // with them, and a kernel that leaks a persisted E×deg-sized table
    // per invocation would accumulate storage across folds
    val out = state.select("start", "walk_idx", "path").localCheckpoint(eager = true)
    aliasDf.unpersist(blocking = false)
    out
  }
}
