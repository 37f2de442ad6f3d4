package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source WEIGHTED shortest paths, hop-bounded — the weighted
  * companion of [[Bfs.multiSourceHops]]: for each landmark source, the
  * minimum total edge weight over directed paths of at most `maxHops`
  * edges. The hop bound is part of the SEMANTICS (not a convergence
  * heuristic): `dist(src, n)` = min weight over ≤ maxHops-hop paths,
  * which is exactly what landmark distance features want at corpus
  * scale and what a hop-bounded recursive SQL oracle replays.
  *
  * Kernel: frontier Bellman–Ford. Round k relaxes only rows whose best
  * distance improved in round k−1; since improvements arrive in hop
  * order, a row dominated at arrival (≥ current best, which came via
  * fewer-or-equal hops) can never seed a better ≤ maxHops-hop
  * extension (weights are required non-negative), so pruning is
  * lossless and after H rounds the state is the exact H-hop-bounded
  * distance table. Parallel edges collapse to their MINIMUM weight up
  * front (pinned: the oracle's GROUP BY min does the same).
  *
  * Scale shape (the [[Bfs]] discipline): per round ONE equi-join of
  * the skinny improved-frontier against the once-reduced edge cache,
  * one map-side-combined min per (src, node), and one join against the
  * running best — which is never re-materialized: each round's
  * IMPROVEMENTS are eagerly checkpointed as immutable leaves and the
  * best table is only ever the lazy min-union of those leaves, so no
  * row is re-written per round. State is |landmarks| × |reach| —
  * bounded by keeping the landmark set small, never the node set.
  */
object Sssp {

  /** (src, node, dist): minimum path weight from each source over
    * paths of ≤ maxHops edges, including (src, src, 0). Pairs
    * unreachable within the hop budget are absent. Weights must be
    * non-negative integers (checked loudly, one tiny aggregate). */
  def boundedDistances(edges: DataFrame, srcCol: String, dstCol: String,
                       wCol: String, sources: Seq[Long], maxHops: Int): DataFrame = {
    require(sources.nonEmpty, "sssp: at least one source")
    require(maxHops >= 0, "sssp: maxHops >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"), col(wCol).cast("long").as("w"))
      .na.drop()
      .groupBy("s", "t").agg(min("w").as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wRow = e.agg(min("w")).head() // also primes the cache
    val wMin = if (wRow.isNullAt(0)) 0L else wRow.getLong(0) // empty graph ok
    require(wMin >= 0, s"sssp: negative edge weight $wMin (hop-bounded " +
      "dominance pruning needs non-negative weights)")
    // improvement leaves: each round's strictly-better rows, eagerly
    // checkpointed once; best = lazy min-union of the leaves
    val leaves = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var frontier = sources.distinct.toDF("src")
      .select(col("src"), col("src").as("node"), lit(0L).as("dist"))
      .localCheckpoint(true)
    leaves += frontier
    var hop = 0
    var frontierRows = frontier.count()
    while (hop < maxHops && frontierRows > 0) {
      hop += 1
      val best = leaves.reduce(_ union _)
        .groupBy("src", "node").agg(min("dist").as("dist"))
      val cand = frontier.join(e, frontier("node") === e("s"))
        .select(frontier("src"), e("t").as("node"),
          (frontier("dist") + e("w")).as("dist"))
        .groupBy("src", "node").agg(min("dist").as("dist"))
      val improved = cand.join(
          best.withColumnRenamed("dist", "best"), Seq("src", "node"), "left")
        .filter(col("best").isNull || col("dist") < col("best"))
        .select("src", "node", "dist")
        .localCheckpoint(true)
      frontierRows = improved.count()
      if (frontierRows > 0) leaves += improved
      frontier = improved
    }
    e.unpersist(blocking = false)
    leaves.reduce(_ union _).groupBy("src", "node").agg(min("dist").as("dist"))
  }
}
