package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Common-neighbor link prediction over an undirected simple graph —
  * the classic missing-edge scorer a KG pipeline runs to propose new
  * facts (Liben-Nowell & Kleinberg 2003): candidate pairs are nodes
  * at distance 2, scored by the overlap of their neighborhoods. The
  * score is **exact integer neighborhood Jaccard**,
  * `jaccard_e4 = cn·10⁴ div (deg_a + deg_b − cn)` — the same
  * sqrt-free cross-engine choice as [[graft.model.ItemKnn]]
  * (Adamic-Adar needs a log and cannot hash-match).
  *
  * Scale anatomy: enumerating distance-2 pairs through a center
  * costs deg(center)² wedges — quadratic in the hottest hub (the
  * same fan-out [[Triangles]] dodges by orientation; here BOTH wedge
  * sides are needed, so orientation cannot help). The standard
  * production mitigation is a center-degree cap: hubs above
  * `maxCenterDeg` stop proposing pairs (a million-follower account
  * linking two strangers is noise, not signal — dropping it is a
  * modeling choice, not an approximation error, and the oracle
  * applies the SAME cap so results stay exact). With the cap the
  * wedge join emits ≤ m·maxCenterDeg rows. Existing edges leave via
  * an anti-join against the edge cache; degrees attach from the
  * skinny (node, deg) table (AQE may broadcast it).
  */
object LinkPrediction {

  /** Returns (a, b, cn, jaccard_e4) for every non-adjacent pair
    * (a < b) with at least `minCn` common neighbors reachable
    * through centers of degree ≤ `maxCenterDeg`. `cn` counts only
    * sub-cap centers; degrees (and the Jaccard denominator) are
    * over the FULL graph.
    *
    * @param edges undirected simple edges (u, v) with u < v, one row
    *              per edge (no duplicates, no self-loops)
    */
  def commonNeighbors(edges: DataFrame, minCn: Long = 1L,
                      maxCenterDeg: Long = 10000L): DataFrame = {
    val e = edges.select(col("u"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = e.select(col("u").as("c"), col("v").as("x"))
      .union(e.select(col("v").as("c"), col("u").as("x")))
    val deg = adj.groupBy(col("c").as("node")).agg(count(lit(1)).as("deg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val capped = adj
      .join(deg.filter(col("deg") <= maxCenterDeg)
        .select(col("node").as("c")), Seq("c"), "left_semi")
      .repartition(col("c"))
    val l = capped.select(col("c"), col("x").as("a"))
    val r = capped.select(col("c"), col("x").as("b"))
    val wedges = l.join(r, Seq("c")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCn)
    // e and deg stay pinned for the result's lifetime — both are
    // multi-referenced by the returned plan (adj union, cap filter,
    // anti-join, two degree attaches), so un-pinning would recompute
    // the edge scan per reference; MEMORY_AND_DISK evicts under
    // pressure.
    wedges
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), "b")
      .select(col("a"), col("b"), col("cn"),
        expr("cn * 10000L div (__da + __db - cn)").as("jaccard_e4"))
  }

  /** Resource-allocation index (Zhou, Lü & Zhang 2009):
    * `ra = Σ_{c ∈ CN(a,b)} 1/deg(c)` — common neighbors weighted DOWN
    * by their degree, the top performer of the local similarity
    * indices in the original benchmark and the natural exact-integer
    * stand-in for Adamic-Adar (1/log deg cannot hash-match across
    * engines; 10⁶ div deg can). Emits (a, b, cn, ra_e6) for
    * non-adjacent pairs with ≥ `minCn` sub-cap common neighbors.
    *
    * Same wedge shape and center-degree cap as [[commonNeighbors]];
    * the only difference is the wedge carries its center's degree so
    * the per-center weight `10⁶ div deg(c)` sums map-side in the same
    * aggregation that counts `cn`. */
  def resourceAllocation(edges: DataFrame, minCn: Long = 1L,
                         maxCenterDeg: Long = 10000L): DataFrame = {
    val e = edges.select(col("u"), col("v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val adj = e.select(col("u").as("c"), col("v").as("x"))
      .union(e.select(col("v").as("c"), col("u").as("x")))
    val deg = adj.groupBy(col("c").as("node")).agg(count(lit(1)).as("deg"))
    val capped = adj
      .join(deg.filter(col("deg") <= maxCenterDeg)
        .select(col("node").as("c"), col("deg").as("cdeg")), Seq("c"))
      .repartition(col("c"))
    val l = capped.select(col("c"), col("cdeg"), col("x").as("a"))
    val r = capped.select(col("c"), col("x").as("b"))
    l.join(r, Seq("c")).filter(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("cn"), sum(expr("1000000L div cdeg")).as("ra_e6"))
      .filter(col("cn") >= minCn)
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("cn"), col("ra_e6"))
  }
}
