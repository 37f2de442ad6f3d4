package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss extraction (Cohen 2008): the maximal subgraph in which
  * every edge participates in at least k−2 triangles OF THE SUBGRAPH —
  * the edge-grained cousin of the k-core ([[Coreness]]), and the
  * standard community-backbone filter (a k-truss edge sits inside
  * k−2 mutually-connected wedges, so it survives where weak bridge
  * edges peel away).
  *
  * Algorithm: synchronous support peeling — per round, count each
  * edge's triangles in the CURRENT edge set and drop edges below
  * k−2; the deletion cascade terminates at the k-truss. Like
  * [[Coreness]] the operator is the fixed-`iters` iterate (exact,
  * engine-replayable; deletion is monotone so any iters ≥ the
  * cascade depth yields the exact truss — probed 2/3/2 rounds to
  * fixpoint on the test projections, default 8).
  *
  * One round's shape:
  *   1. wedges through each center c (a < b both adjacent to c) —
  *      bounded by Σ deg(c)²/2, the [[Triangles]] cost model; the
  *      triangle CLOSES by one equi-join of the wedge against the
  *      edge set on (a, b);
  *   2. each triangle (c, a, b) credits support to its three edges
  *      (one explode, map-side-combined count);
  *   3. edges keep ≥ k−2 support via a left-semi join; eager
  *      localCheckpoint truncates the loop lineage (the [[PageRank]]
  *      discipline).
  *
  * @return the surviving edges with their final support:
  *         (u, v, support ≥ k−2) */
object Truss {

  def ktruss(edges: DataFrame, uCol: String, vCol: String, k: Int,
             iters: Int = 8): DataFrame = {
    require(k >= 3, "ktruss: k >= 3 (k = 2 is the whole graph)")
    require(iters >= 1, "ktruss: iters >= 1")
    var cur = edges.select(col(uCol).as("u"), col(vCol).as("v"))
      .localCheckpoint(true)
    var sup: DataFrame = null
    for (_ <- 1 to iters) {
      val adj = cur.select(col("u").as("c"), col("v").as("x"))
        .union(cur.select(col("v").as("c"), col("u").as("x")))
      // ORDERED triple c < a < b: each triangle is enumerated exactly
      // once (an unordered wedge sees every triangle from all three
      // centers and triples the support); the orientation also bounds
      // hub fan-out the way [[Triangles]]'s orientation does
      val wed = adj.select(col("c"), col("x").as("a"))
        .join(adj.select(col("c"), col("x").as("b")), Seq("c"))
        .filter(col("c") < col("a") && col("a") < col("b"))
      val tri = wed.join(cur.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"))
      sup = tri.select(explode(array(
          struct(col("a").as("u"), col("b").as("v")),
          struct(least(col("c"), col("a")).as("u"), greatest(col("c"), col("a")).as("v")),
          struct(least(col("c"), col("b")).as("u"), greatest(col("c"), col("b")).as("v"))))
          .as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy("u", "v").agg(count(lit(1)).as("support"))
        .filter(col("support") >= (k - 2).toLong)
        .localCheckpoint(true)
      cur = sup.select("u", "v").localCheckpoint(true)
    }
    sup
  }
}
