package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Connected components by min-label propagation to FIXPOINT, on the
  * DataFrame engine — the Tungsten-native alternative to the GraphX
  * path [[graft.text.Dedup]] uses for dedup clusters (q37): whole-stage
  * codegen'd joins/aggregates, AQE, columnar caching, no RDD
  * row-at-a-time overhead. The label of a component is the MINIMUM node
  * id it contains, so the result is a pure function of the edge set —
  * deterministic under any partitioning, and independently replayable
  * by a recursive SQL CTE (transitive min-reachable label).
  *
  * Size-gated kernel dispatch (the [[Scc]] / [[graft.walk.RandomWalks]]
  * discipline — the gate picks a physical kernel, never semantics):
  * at or below `maxLocalEdges` distinct undirected edges with
  * long-typed nodes, the components are resolved by ONE driver-local
  * union–find pass over the collected edge list (2M edges ≈ 32 MB of
  * longs) — an iterative relational loop on a graph this small is pure
  * per-round job latency (measured on q219's 22.6k-edge core graph:
  * ~13 s of rounds vs ~0.1 s local). Above the gate, or for non-long
  * node types, the distributed loop runs; kernels are spec-pinned
  * equal.
  *
  * Physical plan of one distributed round:
  *   - neighbor labels: one shuffle join of the current label table
  *     against the both-direction edge cache (hash-partitioned by src
  *     once, like [[PageRank]]; only the skinny label table moves),
  *   - POINTER JUMP: the label table joined against itself
  *     (l' = label(l)) — candidate labels hop two steps per round, so
  *     convergence needs O(log diameter) rounds instead of O(diameter)
  *     (the shortcutting half of large-star/small-star; jumped labels
  *     stay inside the component, so the fixpoint is unchanged),
  *   - new labels: union with the self-labels + map-side-combined
  *     groupBy MIN; the PREVIOUS label rides the aggregate as a third
  *     column, so convergence (zero strict decreases) is a
  *     filter-count over the checkpointed round — no label-vs-label
  *     join,
  *   - eager localCheckpoint truncates lineage every round (measured in
  *     [[PageRank]]: per-round plan growth otherwise makes iteration
  *     cost superlinear).
  * `maxIters` guards an unconverged loop: the run FAILS rather than
  * silently emitting unconverged labels.
  *
  * Reference ground: dedup cluster assembly (the reference's
  * dedup_clusters pathway mirrored by q37); this operator is the
  * engine-native form run on the q34 semantic near-dup graph in q118.
  */
object ConnectedComponents {

  /** ≤ this many distinct undirected edges (with long node ids) run on
    * the driver union–find kernel — same budget as [[Scc]]. */
  val DefaultMaxLocalEdges = 2000000L

  /** Returns (node, component) for every endpoint of `edges` —
    * component = min node id reachable over the undirected edge set.
    * Node columns must be mutually comparable (component is their
    * MIN). Throws if `maxIters` distributed rounds don't reach the
    * fixpoint (the local kernel below the gate always completes). */
  def run(edges: DataFrame, aCol: String, bCol: String,
          maxIters: Int = 50,
          maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val ue = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val longNodes = e.schema.fields.forall(_.dataType == LongType)
    // ue holds both directions: 2 rows per distinct undirected edge
    // (1 for self-loops — counting those against the budget is fine)
    val out = if (longNodes && ue.count() <= 2 * maxLocalEdges) {
      val local = runLocal(ue)
      ue.unpersist(blocking = false)
      local
    } else runDistributed(ue, maxIters)
    out
  }

  /** Driver union–find (union by size, path halving), components
    * labeled by their min member id — bit-equal to the distributed
    * fixpoint, with zero per-round job latency.
    *
    * Driver footprint (r15, was 4M boxed (Long, Long) tuples ≈ 200+ MB
    * transient at the gate): union–find needs each undirected edge
    * ONCE, so only the a ≤ b direction is collected — self-loops
    * included, they are what registers isolated self-paired nodes —
    * and it is collected as flat primitive long arrays straight off
    * the InternalRow iterator (one array per partition, 2 longs per
    * edge): at the 2M-edge gate that is ~32 MB of longs plus the
    * LongMap state, with no boxed tier. */
  private def runLocal(ue: DataFrame): DataFrame = {
    val spark = ue.sparkSession
    import spark.implicits._
    val flat: Array[Array[Long]] = ue.filter(col("a") <= col("b"))
      .select(col("a").cast("long"), col("b").cast("long"))
      .queryExecution.toRdd.mapPartitions { rows =>
        val buf = scala.collection.mutable.ArrayBuilder.make[Long]
        rows.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect()
    val parent = new scala.collection.mutable.LongMap[Long]()
    val sz = new scala.collection.mutable.LongMap[Long]()
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent.update(x, gp)
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    def add(x: Long): Unit =
      if (!parent.contains(x)) { parent.update(x, x); sz.update(x, 1L) }
    flat.foreach { arr =>
      var i = 0
      while (i < arr.length) {
        val a = arr(i); val b = arr(i + 1); i += 2
        add(a); add(b)
        val ra = find(a); val rb = find(b)
        if (ra != rb) {
          val (big, small) =
            if (sz(ra) >= sz(rb)) (ra, rb) else (rb, ra)
          parent.update(small, big)
          sz.update(big, sz(big) + sz(small))
        }
      }
    }
    val minOf = new scala.collection.mutable.LongMap[Long]()
    val nodes = parent.keys.toArray
    nodes.foreach { n =>
      val r = find(n)
      if (minOf.getOrElse(r, Long.MaxValue) > n) minOf.update(r, n)
    }
    spark.createDataset(nodes.map(n => (n, minOf(find(n)))).toSeq)
      .toDF("node", "component")
  }

  private def runDistributed(ue: DataFrame, maxIters: Int): DataFrame = {
    var labels = ue.select(col("a").as("n")).distinct()
      .withColumn("l", col("n"))
      .localCheckpoint(true)
    val lType = labels.schema("l").dataType
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      val neighborLabels = ue.join(labels, ue("a") === labels("n"))
        .select(col("b").as("n"), col("l"))
      // pointer jump: every label value is itself a node id in the same
      // component, so label(label(n)) is a valid (and 2-hop-better)
      // candidate — this is what turns O(diameter) rounds into O(log)
      val jumped = labels.as("x")
        .join(labels.select(col("n").as("jn"), col("l").as("jl")),
          col("x.l") === col("jn"))
        .select(col("x.n").as("n"), col("jl").as("l"))
      // the previous label rides the aggregate as a third column (the
      // self row is the only non-null `old` per n), so convergence is a
      // filter-count over the checkpointed round — the old form joined
      // next against labels, a second |V|-vs-|V| shuffle join per round
      val next = labels.select(col("n"), col("l"), col("l").as("old"))
        .union(neighborLabels.select(col("n"), col("l"),
          lit(null).cast(lType).as("old")))
        .union(jumped.select(col("n"), col("l"),
          lit(null).cast(lType).as("old")))
        .groupBy("n").agg(min(col("l")).as("l"), max(col("old")).as("old"))
        .localCheckpoint(true)
      val changed = next.filter(col("l") < col("old")).count()
      labels = next.select("n", "l")
      converged = changed == 0
      round += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxIters rounds — " +
        "component diameter exceeds the iteration budget")
    ue.unpersist(blocking = false)
    labels.select(col("n").as("node"), col("l").as("component"))
  }
}
