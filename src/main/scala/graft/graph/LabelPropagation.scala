package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Community detection by synchronous label propagation (Raghavan et
  * al. 2007) — the near-linear-time community algorithm a KG pipeline
  * runs where [[ConnectedComponents]] is too coarse: CC merges
  * everything reachable, LPA splits a connected graph into densely
  * linked groups (bot rings, topic clusters, co-interaction
  * neighborhoods). Matches GraphX's `lib.LabelPropagation` semantics
  * (synchronous mode-label updates) with one strengthening: GraphX
  * breaks frequency ties by hash-map iteration order, this one by
  * SMALLEST label, so the result is a pure function of the edge set —
  * deterministic under any partitioning and replayable in SQL.
  *
  * Per round, every node simultaneously adopts the most frequent
  * label among its neighbors (tie → smallest label). Fixed `iters`
  * rather than convergence: synchronous LPA on bipartite-ish regions
  * can 2-cycle forever (documented in the original paper), so a
  * convergence loop would not terminate — fixed rounds is the
  * standard spec and what GraphX runs.
  *
  * Physical plan, per round: one shuffle join of the skinny
  * (node, label) table against the src-partitioned both-direction
  * edge cache, a map-side-combined count on (dst, label), and an
  * argmax via `min_by(label, (-count, label))` struct ordering — no
  * per-node window sort; the hottest node costs its degree in partial
  * aggregation, not a single-task sort. Eager localCheckpoint per
  * round keeps lineage flat ([[PageRank]]-measured superlinear
  * re-analysis otherwise). Labels are the node ids themselves —
  * comparisons are byte-order string comparisons on both engines, so
  * the tie-break crosses engines exactly (ASCII node labels).
  *
  * Every endpoint of the edge list has degree ≥ 1 by construction,
  * so no keep-old-label fallback is needed (isolated nodes never
  * appear); this keeps each round's plan single-reference, which the
  * DuckDB replay needs (a twice-referenced round CTE re-evaluates
  * the whole unrolled chain exponentially — see the q125 oracle
  * note).
  */
object LabelPropagation {

  /** ≤ this many nodes: broadcast the label table each round (the
    * [[PageRank]] / [[Coreness]] gate discipline). */
  val DefaultBroadcastMaxNodes = 1000000L

  /** Returns (node, community) after `iters` synchronous rounds over
    * the undirected (deduplicated) edge set.
    *
    * r14: nodes are ORDER-PRESERVING dictionary-encoded to longs
    * before iterating — rank under the label ordering via the
    * decomposed [[graft.util.GlobalRank]] (2-char-prefix buckets,
    * never a corpus-wide single-task sort). A strictly monotone
    * bijection commutes with everything LPA compares: mode counts are
    * order-free and both the smallest-label tie-break and the final
    * community id decode by rank, so the output is bit-identical to
    * iterating on the labels themselves (spec-pinned) while every
    * per-round join/aggregate hashes longs instead of label strings
    * (measured 2× CPU on the q126 KG graph: 1.24M directed edge rows
    * × 4 rounds of string hashing was the round cost). */
  def run(edges: DataFrame, aCol: String, bCol: String, iters: Int,
          broadcastMaxNodes: Long = DefaultBroadcastMaxNodes): DataFrame = {
    require(iters >= 1, "labelPropagation: iters >= 1")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val ueRaw = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // eager: the dictionary build scans ueRaw more than once inside a
    // single action — through a LAZY persist those scans race the fill
    // and each recomputes the union+distinct map side (event-log r15:
    // the same distinct exchange ran twice, ~14 CPU-s duplicated on
    // the q126 graph)
    ueRaw.count()
    val dict = graft.util.GlobalRank.withGlobalRank(
        ueRaw.select(col("a").as("n")).distinct(),
        Seq(col("n")), substring(col("n"), 1, 2), rankCol = "nid")
      .select(col("n"), col("nid"))
      // eager checkpoint: the decode join-back must see the exact ids
      // the rounds ran on (the PageRank dictionary discipline)
      .localCheckpoint(true)
    val nNodes = dict.count()
    val small = nNodes <= broadcastMaxNodes
    def gate(df: DataFrame) = if (small) broadcast(df) else df
    // under the gate the labels broadcast, so the edge cache is
    // partitioned by the AGGREGATION key b: HashPartitioning(b)
    // satisfies groupBy(b, l) and the groupBy(n = b) argmax — a round
    // then plans ZERO exchanges (a checkpointed label table has no
    // size statistics, so AQE never finds this broadcast by itself).
    // Above the gate, partitioning by the JOIN key a moves only the
    // skinny label table per round.
    //
    // The ENCODE joins carry the same gate (r15): dict is a checkpoint
    // with no size statistics, so without it the planner ran BOTH
    // dict joins as sort-merge — two full exchanges + sorts of the
    // directed edge set per run (event-log: 9.3 CPU-s of the q126
    // window in exactly those exchanges).
    val ue = ueRaw
      .join(gate(dict.select(col("n").as("a"), col("nid").as("sa"))), Seq("a"))
      .join(gate(dict.select(col("n").as("b"), col("nid").as("sb"))), Seq("b"))
      .select(col("sa").as("a"), col("sb").as("b"))
      .repartition(col(if (small) "b" else "a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ue.select(col("a").as("n")).distinct()
      .withColumn("l", col("n"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      labels = ue.join(gate(labels), ue("a") === labels("n"))
        .groupBy(col("b").as("n"), col("l"))
        .agg(count(lit(1)).as("c"))
        .groupBy("n")
        .agg(min_by(col("l"), struct(negate(col("c")), col("l"))).as("l"))
        .localCheckpoint(true)
    }
    ueRaw.unpersist(blocking = false)
    ue.unpersist(blocking = false)
    labels
      .join(gate(dict.select(col("nid").as("n"), col("n").as("__node"))), Seq("n"))
      .join(gate(dict.select(col("nid").as("l"), col("n").as("__comm"))), Seq("l"))
      .select(col("__node").as("node"), col("__comm").as("community"))
  }
}
