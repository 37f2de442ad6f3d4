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
      sup = supportRound(cur)
        .filter(col("support") >= (k - 2).toLong)
        .localCheckpoint(true)
      cur = sup.select("u", "v").localCheckpoint(true)
    }
    sup
  }

  /** One synchronous support round: each surviving edge's triangle
    * count in the CURRENT edge set, via the degree-oriented wedge
    * (scaladoc above). Returns (u, v, support ≥ 1) — triangle-free
    * edges are ABSENT (their support is 0). */
  private def supportRound(cur: DataFrame): DataFrame = {
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
    tri.select(explode(array(
        struct(least(col("src"), col("a")).as("u"), greatest(col("src"), col("a")).as("v")),
        struct(least(col("src"), col("b")).as("u"), greatest(col("src"), col("b")).as("v")),
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("support"))
  }

  /** Eager checkpoint PLUS a statistics barrier: `localCheckpoint`
    * preserves the ORIGIN plan's Catalyst size estimate on the
    * resulting LogicalRDD, and one peel round multiplies estimates
    * across two self-joins — so a deep loop compounds sizeInBytes
    * roughly CUBING it per round. The number stays a lazy BigInteger
    * until an optimizer pass touches it, at which point round ~25
    * sits in Toom-Cook multiplying numbers with billions of bits (the
    * driver pegged one core for 20+ minutes at sf0.001 before this
    * barrier). Rebuilding the frame from the checkpointed RDD resets
    * stats to the default constant, so per-round products stay a few
    * hundred bits. Row-conversion cost is per-edge-narrow and tiny
    * next to the round's joins. */
  private def checkpointBarrier(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(true)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** FULL truss decomposition (capped): the max k such that the edge
    * survives the k-truss, for every input edge — the edge-grained
    * analogue of [[Coreness]]. Peel-to-empty with BOUNDED loops so a
    * SQL engine can replay it verbatim: for k = 3..`kMax`, cascade at
    * most `innerIters` support rounds (each drops edges below k−2,
    * exactly [[ktruss]]'s round); an edge's trussness is the last k
    * whose truss still contains it (triangle-free edges stay at 2,
    * k-truss survivors at k = kMax report kMax, i.e. "≥ kMax").
    *
    * Exactness: the fixed bounds are a REPLAY discipline, not an
    * approximation — whenever `innerIters` covers every cascade depth
    * and `kMax` exceeds the graph's max trussness (probed 13 / 7 on
    * the q161 projection; defaults 16 / 8), the result is the exact
    * decomposition, and the spec pins exact values on hand-worked
    * graphs. The driver loop short-circuits on two provably result-
    * identical conditions — a round that drops nothing (peeling is
    * monotone: all later rounds at this k are no-ops) and an empty
    * edge set (all later k produce nothing) — so converged data never
    * pays the full unroll the oracle replays.
    *
    * Scale shape: every round is the degree-oriented wedge of
    * [[ktruss]] (hub-safe, probed at 5M edges) + one map-side-combined
    * support count; the label accumulator is a skinny (u, v, k) frame
    * re-checkpointed per k, never a window or a collect.
    *
    * @return (u, v, trussness) for EVERY distinct input edge,
    *         endpoints id-normalized u < v */
  def trussness(edges: DataFrame, uCol: String, vCol: String,
                kMax: Int = 8, innerIters: Int = 16): DataFrame = {
    require(kMax >= 3, "trussness: kMax >= 3")
    require(innerIters >= 1, "trussness: innerIters >= 1")
    val all = edges.select(
        least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(true)
    var result = all.select(col("u"), col("v"), lit(2L).as("trussness"))
    var cur = all
    var n = cur.count()
    var k = 3
    while (k <= kMax && n > 0) {
      // cascade to the k-truss (≤ innerIters rounds, early-out on fixpoint)
      var i = 0
      var stable = false
      while (i < innerIters && !stable && n > 0) {
        val next = checkpointBarrier(supportRound(cur)
          .filter(col("support") >= (k - 2).toLong)
          .select("u", "v"))
        val m = next.count()
        stable = m == n // support rounds only remove: same count = no drop
        cur = next; n = m; i += 1
      }
      // k-truss survivors raise their label to k
      result = result
        .join(cur.select(col("u"), col("v"), lit(1).as("__s")), Seq("u", "v"), "left")
        .select(col("u"), col("v"),
          when(col("__s").isNotNull, lit(k.toLong)).otherwise(col("trussness"))
            .as("trussness"))
      result = checkpointBarrier(result)
      k += 1
    }
    result
  }
}
