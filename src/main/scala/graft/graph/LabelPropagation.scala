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

  /** Returns (node, community) after `iters` synchronous rounds over
    * the undirected (deduplicated) edge set. */
  def run(edges: DataFrame, aCol: String, bCol: String, iters: Int): DataFrame = {
    require(iters >= 1, "labelPropagation: iters >= 1")
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val ue = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ue.select(col("a").as("n")).distinct()
      .withColumn("l", col("n"))
      .localCheckpoint(true)
    for (_ <- 0 until iters) {
      labels = ue.join(labels, ue("a") === labels("n"))
        .groupBy(col("b").as("n"), col("l"))
        .agg(count(lit(1)).as("c"))
        .groupBy("n")
        .agg(min_by(col("l"), struct(negate(col("c")), col("l"))).as("l"))
        .localCheckpoint(true)
    }
    ue.unpersist(blocking = false)
    labels.select(col("n").as("node"), col("l").as("community"))
  }
}
