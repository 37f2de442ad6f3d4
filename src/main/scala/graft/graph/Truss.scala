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
  *   1. DEGREE-ordered triangle enumeration, exactly [[Triangles]]'
  *      orientation: every edge points from its lower-(deg, id)
  *      endpoint to the higher one, wedges open only at each
  *      triangle's lowest vertex and close by one oriented (a, b)
  *      semi-join — so a 100k-degree hub contributes O(Σ its
  *      neighbors' small degrees) wedges, not deg(hub)²/2. (A raw
  *      id-ordered wedge counts each triangle once but still fans
  *      out quadratically on a low-id hub — measured: one 27-minute
  *      straggler task on the 5M-edge probe graph before this
  *      orientation; minutes after.)
  *   2. each triangle (c, a, b) credits support to its three
  *      id-normalized edges (one explode, map-side-combined count);
  *   3. edges keep ≥ k−2 support; eager localCheckpoint truncates
  *      the loop lineage (the [[PageRank]] discipline). Orientation
  *      is a physical choice — support counts are orientation-
  *      invariant, so the DuckDB replay keeps the simpler id-ordered
  *      wedge and still hash-matches.
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
      val deg = cur.select(col("u").as("node"))
        .unionByName(cur.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val withDeg = cur
        .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      val uFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      // referenced three times below (two wedge legs + the close);
      // eager checkpoint materializes it once per round
      val oriented = withDeg.select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
        .localCheckpoint(true)
      val wed = oriented.select(col("src"), col("dst").as("a"), col("ddeg").as("adeg"))
        .join(oriented.select(col("src"), col("dst").as("b"), col("ddeg").as("bdeg")),
          Seq("src"))
        .filter(col("adeg") < col("bdeg") ||
          (col("adeg") === col("bdeg") && col("a") < col("b")))
      val tri = wed.join(oriented.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_semi")
      sup = tri.select(explode(array(
          struct(least(col("src"), col("a")).as("u"), greatest(col("src"), col("a")).as("v")),
          struct(least(col("src"), col("b")).as("u"), greatest(col("src"), col("b")).as("v")),
          struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))))
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
