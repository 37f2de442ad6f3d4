package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** STRONGLY connected components of a directed edge list — the
  * web-graph structure pass ([[ConnectedComponents]]'s directed
  * sibling): crawl-loop detection, link-farm analysis, dependency-
  * cycle audits. Implements the parallel FW-BW-Trim coloring scheme
  * (Fleischer et al. 2000; Orzan 2004; Slota et al. 2014) on the
  * DataFrame engine, with the SCC id fixed to the MINIMUM node id in
  * the component — a pure function of the edge set, deterministic
  * under any partitioning, independently replayable by a recursive
  * SQL closure (mutual reachability) at oracle scale.
  *
  * Per outer round:
  *   1. TRIM to fixpoint (uncapped — each iteration strictly shrinks
  *      the remaining node set, so termination is structural): nodes
  *      with no in-edge or no out-edge among remaining nodes cannot
  *      sit on a cycle — each is its own singleton SCC. Trimming is
  *      what disposes of long acyclic chains/tails in cheap semi-join
  *      iterations instead of expensive coloring rounds (a pure DAG
  *      of ANY depth resolves entirely here, one layer per
  *      iteration).
  *   2. COLOR to fixpoint: forward min-label propagation
  *      (c(v) = min id that reaches v), FRONTIER form — only labels
  *      that changed last iteration propagate (a label can only
  *      decrease via a neighbor's decrease, so tracing decreasing
  *      updates from the all-nodes initial frontier is complete).
  *      After the first sweep the per-iteration join probe is the
  *      frontier, not the corpus, and the label table itself updates
  *      through a partitioning-preserved left join (labels stay hash-
  *      partitioned on the node id across iterations — the exchange
  *      each iteration moves only the skinny update set).
  *   3. PIVOT BACKWARD REACH: within each color class, the pivot is
  *      the node that IS its color; nodes of the class that reach the
  *      pivot (FRONTIER backward propagation restricted to same-color
  *      edges) are exactly SCC(pivot) — assigned and removed. Every
  *      color class resolves one SCC per round, all classes in
  *      parallel.
  *
  * The coloring and backward-reach fixpoints keep iteration guards and
  * the outer loop FAILS rather than emitting unconverged components
  * (the [[ConnectedComponents]] contract). Lineage is truncated with
  * eager localCheckpoint per iteration — the iterative-DataFrame
  * discipline measured in [[PageRank]]/[[Coreness]].
  *
  * COMPLEXITY ENVELOPE (honest bound): a coloring round resolves ONE
  * SCC per color class, so the outer-round count is the longest CHAIN
  * of non-trivial SCCs inside a color class — O(condensation-DAG
  * depth restricted to cycles). Web-scale graphs fit the envelope
  * (bow-tie: one giant SCC, shallow cyclic residue — the structure
  * assumption of Slota et al.'s Multistep method); a long chain of
  * small cycles does NOT, and fails the `maxOuterRounds` guard loudly
  * rather than running unbounded. (Acyclic chains are fine — TRIM
  * runs to its structural fixpoint and peels a DAG of any depth in
  * cheap semi-join iterations.) The local
  * Tarjan kernel below the gate has no such bound — at the default
  * 2M-edge gate, chain-of-cycles graphs that exceed the distributed
  * envelope in the wild are rare enough that the loud guard is the
  * right trade.
  *
  * Reference ground: cycle structure over directed KG relations; the
  * undirected dedup-cluster path (q37/q118) deliberately ignores
  * direction — this operator is the analysis that direction makes
  * meaningful.
  */
object Scc {

  /** Size gate: at or below this many DISTINCT edges the component
    * structure is resolved by a driver-local iterative Tarjan over the
    * collected edge list — one linear pass, no per-iteration job
    * overhead (the [[graft.walk.RandomWalks]] local/distributed
    * dispatch discipline: the gate picks a physical kernel, never
    * semantics; kernels are spec-pinned bit-equal). Above the gate the
    * distributed FW-BW-Trim loop runs. 2M edges ≈ 32 MB of longs on
    * the driver. */
  val DefaultMaxLocalEdges = 2000000L

  /** Returns (node, scc_id) for every endpoint of `edges`; scc_id =
    * min node id of the strongly connected component. Node columns
    * must be long-typed (or castable) and mutually comparable. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxOuterRounds: Int = 30, maxColorIters: Int = 80,
          maxLocalEdges: Long = DefaultMaxLocalEdges): DataFrame = {
    val eDist = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
      // NULL (or non-castable) endpoints carry no reachability: drop
      // them here so both kernels see the same graph — without this
      // the local kernel crashes on the non-nullable decode while the
      // distributed one would emit a (null, null) row
      .filter(col("s").isNotNull && col("t").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nEdges = eDist.count()
    val out = if (nEdges <= maxLocalEdges) runLocal(eDist)
              else runDistributed(eDist, maxOuterRounds, maxColorIters)
    eDist.unpersist(blocking = false)
    out
  }

  /** Driver-local kernel: iterative Tarjan (explicit work stack — no
    * JVM recursion) over the collected distinct edges; result
    * re-parallelized. Deterministic: SCC membership is a pure graph
    * property and the emitted id is the component MIN regardless of
    * traversal order. */
  private def runLocal(eDist: DataFrame): DataFrame = {
    val spark = eDist.sparkSession
    import spark.implicits._
    val pairs = eDist.as[(Long, Long)].collect()
    val adj = pairs.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val nodes = (pairs.map(_._1) ++ pairs.map(_._2)).distinct
    val index = scala.collection.mutable.Map[Long, Int]()
    val low = scala.collection.mutable.Map[Long, Int]()
    val onStack = scala.collection.mutable.Set[Long]()
    val stack = scala.collection.mutable.Stack[Long]()
    val comp = scala.collection.mutable.Map[Long, Long]()
    var counter = 0
    final class Frame(val v: Long, var i: Int)
    nodes.foreach { v0 =>
      if (!index.contains(v0)) {
        val work = scala.collection.mutable.Stack(new Frame(v0, 0))
        index(v0) = counter; low(v0) = counter; counter += 1
        stack.push(v0); onStack += v0
        while (work.nonEmpty) {
          val f = work.top
          val succ = adj.getOrElse(f.v, Array.empty[Long])
          if (f.i < succ.length) {
            val w = succ(f.i); f.i += 1
            if (!index.contains(w)) {
              index(w) = counter; low(w) = counter; counter += 1
              stack.push(w); onStack += w
              work.push(new Frame(w, 0))
            } else if (onStack(w)) low(f.v) = math.min(low(f.v), index(w))
          } else {
            work.pop()
            if (work.nonEmpty) {
              val p = work.top.v
              low(p) = math.min(low(p), low(f.v))
            }
            if (low(f.v) == index(f.v)) {
              val members = scala.collection.mutable.Buffer[Long]()
              var w = stack.pop(); onStack -= w; members += w
              while (w != f.v) { w = stack.pop(); onStack -= w; members += w }
              val id = members.min
              members.foreach(m => comp(m) = id)
            }
          }
        }
      }
    }
    comp.toSeq.sortBy(_._1).toDF("node", "scc_id")
  }

  /** Distributed FW-BW-Trim coloring kernel (see object scaladoc). */
  private def runDistributed(eDist: DataFrame, maxOuterRounds: Int,
                             maxColorIters: Int): DataFrame = {
    val e0 = eDist
      .repartition(col("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var rem = e0.select(col("s").as("v"))
      .union(e0.select(col("t").as("v"))).distinct()
      .localCheckpoint(true)
    var out: DataFrame = null
    def addOut(df: DataFrame): Unit =
      out = if (out == null) df.localCheckpoint(true)
            else out.union(df).localCheckpoint(true)

    var round = 0
    while (round < maxOuterRounds && rem.limit(1).count() > 0) {
      // remaining-edge cache for this round, hash-partitioned on s so
      // every frontier probe below joins against it without
      // re-exchanging the edge table (localCheckpoint preserves the
      // physical partitioning into the checkpointed plan)
      var eRem = e0.join(rem.select(col("v").as("s")), Seq("s"), "left_semi")
        .join(rem.select(col("v").as("t")), Seq("t"), "left_semi")
        .select("s", "t")
        .repartition(col("s"))
        .localCheckpoint(true)

      // 1. trim to fixpoint — UNcapped: an iteration either strictly
      // shrinks rem or stops, so termination is structural and a pure
      // DAG of any depth resolves entirely here (one layer per
      // iteration; was capped pre-r14, which broke the documented
      // contract on >~160-deep acyclic chains)
      var trimming = true
      while (trimming) {
        val keep = rem
          .join(eRem.select(col("s").as("v")).distinct(), Seq("v"), "left_semi")
          .join(eRem.select(col("t").as("v")).distinct(), Seq("v"), "left_semi")
          .localCheckpoint(true)
        val dropped = rem.join(keep, Seq("v"), "left_anti")
          .select(col("v").as("node"), col("v").as("scc_id"))
        val nDropped = dropped.count()
        if (nDropped > 0) {
          addOut(dropped)
          rem = keep
          eRem = eRem.join(rem.select(col("v").as("s")), Seq("s"), "left_semi")
            .join(rem.select(col("v").as("t")), Seq("t"), "left_semi")
            .select("s", "t")
            .repartition(col("s"))
            .localCheckpoint(true)
        } else trimming = false
      }

      if (rem.limit(1).count() > 0) {
        // 2. forward min-coloring, FRONTIER form: only labels that
        // CHANGED last iteration propagate (complete — a label can
        // only decrease via a neighbor's decrease, and the initial
        // frontier is every node). After the first sweep the edge
        // probe joins against the skinny frontier (AQE broadcasts it
        // once checkpointed with a known small size), so the steady-
        // state per-iteration cost is one eRem scan + one labels
        // scan, not a corpus-wide union+groupBy+diff (the pre-r14
        // shape — measured 155 s vs local 41 s on the 5M-edge
        // bow-tie probe).
        var labels = rem.select(col("v").as("n")).withColumn("c", col("n"))
          .repartition(col("n"))
          .localCheckpoint(true)
        var frontier = labels
        var colored = false
        var it = 0
        while (!colored && it < maxColorIters) {
          val inc = eRem
            .join(frontier.select(col("n").as("s"), col("c")), Seq("s"))
            .groupBy(col("t").as("n")).agg(min("c").as("cn"))
          val upd = inc.join(labels, Seq("n"))
            .filter(col("cn") < col("c"))
            .select(col("n"), col("cn").as("c"))
            .localCheckpoint(true)
          if (upd.limit(1).count() == 0) colored = true
          else {
            labels = labels
              .join(upd.select(col("n"), col("c").as("__cu")), Seq("n"), "left")
              .select(col("n"), coalesce(col("__cu"), col("c")).as("c"))
              .repartition(col("n"))
              .localCheckpoint(true)
            frontier = upd
          }
          it += 1
        }
        require(colored,
          s"scc: coloring did not converge in $maxColorIters iterations")

        // same-color edge view with endpoint colors attached
        val eLab = eRem
          .join(labels.select(col("n").as("s"), col("c").as("cs")), Seq("s"))
          .join(labels.select(col("n").as("t"), col("c").as("ct")), Seq("t"))
          .filter(col("cs") === col("ct"))
          .select(col("s"), col("t"))
          .repartition(col("t"))
          .localCheckpoint(true)

        // 3. backward reach from each color's pivot (pivot = its
        // color), FRONTIER form: probe predecessors of the newly
        // reached set only; the accumulated marks are touched once
        // per iteration by the dedup anti-join
        var marks = labels.filter(col("n") === col("c")).select(col("n").as("v"))
          .repartition(col("v"))
          .localCheckpoint(true)
        var bFront = marks
        var growing = true
        var bit = 0
        while (growing && bit < maxColorIters) {
          val reached = eLab
            .join(bFront.select(col("v").as("t")), Seq("t"), "left_semi")
            .select(col("s").as("v")).distinct()
            .join(marks, Seq("v"), "left_anti")
            .localCheckpoint(true)
          if (reached.limit(1).count() > 0) {
            marks = marks.union(reached).repartition(col("v")).localCheckpoint(true)
            bFront = reached
          } else growing = false
          bit += 1
        }
        require(!growing,
          s"scc: backward reach did not converge in $maxColorIters iterations")

        addOut(marks.join(labels, marks("v") === labels("n"))
          .select(col("n").as("node"), col("c").as("scc_id")))
        rem = rem.join(marks, Seq("v"), "left_anti").localCheckpoint(true)
      }
      round += 1
    }
    require(rem.limit(1).count() == 0,
      s"scc: $maxOuterRounds outer rounds did not resolve all nodes")
    e0.unpersist(blocking = false)
    if (out == null) e0.select(col("s").as("node"), col("s").as("scc_id")).limit(0)
    else out
  }
}
