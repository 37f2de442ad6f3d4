package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components by min-label propagation to FIXPOINT, on the
  * DataFrame engine — the Tungsten-native alternative to the GraphX
  * path [[graft.text.Dedup]] uses for dedup clusters (q37): whole-stage
  * codegen'd joins/aggregates, AQE, columnar caching, no RDD
  * row-at-a-time overhead. The label of a component is the MINIMUM node
  * id it contains, so the result is a pure function of the edge set —
  * deterministic under any partitioning, and independently replayable
  * by a recursive SQL CTE (transitive min-reachable label).
  *
  * Physical plan, per round:
  *   - neighbor labels: one shuffle join of the current label table
  *     against the both-direction edge cache (hash-partitioned by src
  *     once, like [[PageRank]]; only the skinny label table moves),
  *   - new labels: union with the self-labels + map-side-combined
  *     groupBy MIN,
  *   - convergence: a skinny label-vs-label join counting strict
  *     decreases — 0 means fixpoint,
  *   - eager localCheckpoint truncates lineage every round (measured in
  *     [[PageRank]]: per-round plan growth otherwise makes iteration
  *     cost superlinear).
  * Plain propagation needs O(component diameter) rounds — the right
  * trade for near-dup graphs, whose components are short-chained by
  * construction (a doc links to its anchor). For adversarial
  * long-chain graphs, large-star/small-star halves paths per round;
  * `maxIters` guards against feeding one in unnoticed: the run FAILS
  * rather than silently emitting unconverged labels.
  *
  * Reference ground: dedup cluster assembly (the reference's
  * dedup_clusters pathway mirrored by q37); this operator is the
  * engine-native form run on the q34 semantic near-dup graph in q118.
  */
object ConnectedComponents {

  /** Returns (node, component) for every endpoint of `edges` —
    * component = min node id reachable over the undirected edge set.
    * Node columns must be mutually comparable (component is their
    * MIN). Throws if `maxIters` rounds don't reach the fixpoint. */
  def run(edges: DataFrame, aCol: String, bCol: String,
          maxIters: Int = 50): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
    val ue = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .repartition(col("a"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ue.select(col("a").as("n")).distinct()
      .withColumn("l", col("n"))
      .localCheckpoint(true)
    var converged = false
    var round = 0
    while (!converged && round < maxIters) {
      val neighborLabels = ue.join(labels, ue("a") === labels("n"))
        .select(col("b").as("n"), col("l"))
      val next = labels.union(neighborLabels)
        .groupBy("n").agg(min(col("l")).as("l"))
        .localCheckpoint(true)
      val changed = next.as("x").join(labels.as("y"), col("x.n") === col("y.n"))
        .filter(col("x.l") < col("y.l")).count()
      labels = next
      converged = changed == 0
      round += 1
    }
    require(converged,
      s"connectedComponents: no fixpoint after $maxIters rounds — " +
        "component diameter exceeds the iteration budget")
    ue.unpersist(blocking = false)
    labels.select(col("n").as("node"), col("l").as("component"))
  }
}
