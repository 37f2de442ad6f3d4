package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration PageRank over an edge list, in EXACT scaled-integer
  * arithmetic so an independent SQL engine replays every rank
  * bit-for-bit (float PageRank — GraphX's included — diverges by ulps
  * across engines and iteration orders; integer `div` does not).
  *
  * Semantics match GraphX's unnormalized form: every node starts at
  * `scale` (1.0 in fixed-point), and per iteration
  *   rank' = (15*scale) div 100 + (85 * sum_in(rank div outdeg)) div 100
  * with damping 0.85. Dangling nodes keep contributing nothing (mass
  * leaks, as in GraphX); nodes with no in-edges settle at the teleport
  * term. Overflow headroom: the hottest node's incoming sum is bounded
  * by total mass N*scale, so N*scale*85 must stay < 2^63 — at the
  * default scale 1e9 that is ~1e8 nodes; drop `scale` for larger
  * graphs.
  *
  * Physical plan, per iteration: one shuffle join of the skinny rank
  * table against the edge list (the edge side is hash-partitioned by
  * src ONCE and persisted, so only the rank side moves after the first
  * iteration) and one map-side-combined groupBy(dst). Ranks are
  * re-persisted and the previous iteration unpersisted each round to
  * keep lineage flat — the classic iterative-DataFrame discipline.
  *
  * Reference ground: node importance over the KG triple graph
  * (kg/graph.py builds the same edge set this is run on in q116);
  * PageRank itself is the standard recsys/KG baseline the reference's
  * popularity recommender approximates.
  */
object PageRank {

  /** Returns (node, rank_e) — one row per distinct endpoint, rank in
    * `scale` fixed-point after `iters` rounds. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, "pagerank: iters >= 0")
    val teleport = (15L * scale) / 100L
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
    // out-degrees ride with the edges: partition by s once, the
    // per-iteration join then only exchanges the skinny rank table
    val eo = e.join(e.groupBy("s").agg(count(lit(1)).as("d")), "s")
      .repartition(col("s"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("s").as("n")).union(e.select(col("t").as("n")))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("r", lit(scale))
    var prev: DataFrame = null
    for (_ <- 0 until iters) {
      val contrib = eo.join(ranks, eo("s") === ranks("n"))
        .select(col("t"), expr("r div d").as("c"))
        .groupBy("t").agg(sum(col("c")).as("cs"))
      val next = nodes.join(contrib, nodes("n") === contrib("t"), "left")
        .select(col("n"),
          (lit(teleport) + expr("85 * coalesce(cs, 0L) div 100")).as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      next.count() // materialize before dropping the parent cache
      if (prev != null) prev.unpersist(blocking = false)
      prev = ranks
      ranks = next
    }
    val out = ranks.select(col("n").as("node"), col("r").as("rank_e"))
    eo.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }
}
