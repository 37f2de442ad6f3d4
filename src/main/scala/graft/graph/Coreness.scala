package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Full k-core decomposition (coreness per node) by the h-index
  * fixed-point iteration (Lü, Zhou et al. 2016, "The H-index of a
  * network node"): start every node at its degree and repeatedly set
  * `c(v) ← H({c(u) : u ∈ N(v)})`, the largest h such that at least h
  * neighbors currently hold value ≥ h. The iterate decreases
  * monotonically and its fixed point IS the coreness — unlike the
  * classic sequential peel (min-degree deletion, inherently serial),
  * every round is one synchronous relational pass, the same
  * fixed-iteration discipline as [[PageRank]]/[[Hits]]. The operator
  * is defined as the `iters`-round iterate (exact, engine-replayable);
  * on the test graphs it converges well before the default 20 rounds
  * (probed: 12 / 12 / 17 rounds to fixpoint at sf0.001/0.01/0.1, each
  * matching an independent exact-peeling implementation).
  *
  * Scale anatomy of one round:
  *   1. neighbor values: one equi-join of the persisted adjacency
  *      against the skinny (node, c) table — size-gated broadcast
  *      (≤ `broadcastMaxNodes`), above the gate a shuffle of only the
  *      value table against the x-partitioned edge cache;
  *   2. H is computed from the per-node VALUE ROLLUP, not the raw
  *      neighbor list: group to (n, c, m), then
  *      `H = max(least(c, cum_m))` over values sorted descending —
  *      the window sees at most |distinct neighbor values| rows per
  *      node (≤ deg, typically ≪), the same rollup-first discipline
  *      as the Gini rank sum (q137);
  *   3. each round ends in an eager `localCheckpoint` — the
  *      [[PageRank]] discipline: persist alone leaves the logical plan
  *      deepening every round and Catalyst re-analysis turns 20 rounds
  *      superlinear (measured here: 10 rounds 22.7 s persist-only vs
  *      flat ~0.3 s/round truncated).
  *
  * All integers; bit-exact in any engine. The DuckDB replay unrolls
  * the same rounds with one MATERIALIZED CTE per round — deep
  * single-reference CTE chains explode DuckDB's optimizer even when
  * evaluation would be linear (the q125 lesson's optimizer-side
  * sibling; 20 inlined rounds planned > 300 s, materialized 0.2 s).
  */
object Coreness {

  /** Size gate for broadcasting the per-node value table each round —
    * the [[PageRank]] broadcastMaxNodes discipline: below it every
    * round is EXCHANGE-FREE (see [[run]]); above it the joins fall
    * back to shuffles against the x-partitioned edge cache. */
  val DefaultBroadcastMaxNodes = 1000000L

  /** @param edges undirected simple edges (one row per edge)
    * @return (node, coreness) — the `iters`-round h-index iterate */
  def run(edges: DataFrame, uCol: String, vCol: String, iters: Int = 20,
          broadcastMaxNodes: Long = DefaultBroadcastMaxNodes): DataFrame = {
    require(iters >= 0, "coreness: iters >= 0")
    val e = edges.select(col(uCol).as("u"), col(vCol).as("v"))
    // adj stays pinned for the whole loop and the result's lifetime
    // (every round and the final lineage reference it), hash-partitioned
    // ONCE (the [[PageRank]] edge-cache discipline). Under the broadcast
    // gate it is partitioned by the GROUP key n: the per-round join
    // broadcasts the skinny (n, c) table, and since
    // HashPartitioning(n) satisfies every downstream requirement —
    // groupBy(n, c), the window over n, groupBy(n) — the WHOLE ROUND
    // runs without a single exchange (a localCheckpoint'd table has no
    // size statistics, so AQE never discovers this broadcast by
    // itself: the cur side otherwise plans as a shuffle join that
    // re-exchanges nothing less than the joined 2|E| neighbor rows
    // every round). Above the gate it is partitioned by the JOIN key x
    // so the shuffle join moves only the skinny value table.
    val adjRaw = e.select(col("u").as("n"), col("v").as("x"))
      .union(e.select(col("v").as("n"), col("u").as("x")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nNodes = adjRaw.select("n").distinct().count()
    val small = nNodes <= broadcastMaxNodes
    def gate(df: DataFrame) = if (small) broadcast(df) else df
    val adj = adjRaw.repartition(col(if (small) "n" else "x"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var cur = adj.groupBy("n").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    adjRaw.unpersist(blocking = false)
    val w = Window.partitionBy("n").orderBy(col("c").desc)
    // the h-index iterate decreases monotonically, so Σc strictly
    // decreases until the fixpoint: once the sum repeats, every later
    // round is the identity and the remaining iterations can be skipped
    // — the OUTPUT is bit-identical to running all `iters` rounds
    // (probed 12/12/17 rounds to fixpoint at sf0.001/0.01/0.1 vs the
    // fixed 20). One scalar aggregate per round on the checkpointed
    // rollup, no join.
    var prevSum: Option[Long] = None
    var round = 0
    var fixed = false
    while (round < iters && !fixed) {
      val nb = adj.join(gate(cur.select(col("n").as("x"), col("c"))), Seq("x"))
      cur = nb.groupBy("n", "c").agg(count(lit(1)).as("m"))
        .withColumn("cum", sum("m").over(w))
        .groupBy("n").agg(max(least(col("c"), col("cum"))).as("c"))
        .localCheckpoint(true) // eager: materializes AND truncates lineage
      // coalesce: sum over an EMPTY value table is NULL (a degenerate
      // input — e.g. an edge-free warmup slice — must exit, not NPE)
      val curSum = cur.agg(coalesce(sum("c"), lit(0L))).head.getLong(0)
      fixed = prevSum.contains(curSum)
      prevSum = Some(curSum)
      round += 1
    }
    cur.select(col("n").as("node"), col("c").as("coreness"))
  }
}
