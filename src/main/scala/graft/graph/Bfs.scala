package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distances — the landmark-distance primitive
  * (GraphFrames `shortestPaths` semantics): for every source in a
  * small landmark set, the minimum hop count to every node reachable
  * within `maxHops` over DIRECTED edges. Feeds graph features
  * (closeness-to-hub, crawl-depth), reachability audits, and the
  * landmark sketch of node distance at corpus scale.
  *
  * Scale shape: per round ONE equi-join of the frontier against the
  * once-deduped edge cache (keyed on the edge source) and one
  * anti-join against the visited set (keyed on (src, node)) — the
  * frontier is the only growing stream and it is skinny (src, node,
  * dist). State is |landmarks| × |reached nodes|, bounded by keeping
  * the landmark set small (the 100 TB discipline: landmarks are
  * dozens, never the node set). Each round is eagerly
  * localCheckpoint'd so lineage stays flat across iterations (the
  * PageRank/LPA loop discipline). Past ~2M edges the Pregel-style RDD
  * kernel ([[Scc]]'s message-passing shape) is the natural rebase;
  * the DataFrame loop is the correct form at landmark counts × the
  * sf scales and keeps the plan replayable.
  */
object Bfs {

  /** (src, node, dist): min-hop distances from each source, dist ≤
    * maxHops, including (src, src, 0). Unreachable (within maxHops)
    * pairs are absent. */
  def multiSourceHops(edges: DataFrame, srcCol: String, dstCol: String,
                      sources: Seq[Long], maxHops: Int): DataFrame = {
    require(sources.nonEmpty, "bfs: at least one source")
    require(maxHops >= 0, "bfs: maxHops >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col(srcCol).cast("long").as("s"),
        col(dstCol).cast("long").as("t"))
      .na.drop().distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    e.count() // eager: every round scans the same deduped cache
    // each FRONTIER is eagerly checkpointed exactly once; the visited
    // set is only ever a LAZY union of those materialized leaves, so
    // no row is re-written per round (re-checkpointing the accumulated
    // set would materialize O(rounds × reach) rows)
    val frontiers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var frontier = sources.distinct.toDF("src")
      .select(col("src"), col("src").as("node"), lit(0).as("dist"))
      .localCheckpoint(true)
    frontiers += frontier
    var hop = 0
    var frontierRows = frontier.count()
    while (hop < maxHops && frontierRows > 0) {
      hop += 1
      val visited = frontiers.reduce(_ union _)
      val next = frontier.join(e, frontier("node") === e("s"))
        .select(frontier("src"), e("t").as("node"))
        .distinct()
        .join(visited.select("src", "node"), Seq("src", "node"), "left_anti")
        .withColumn("dist", lit(hop))
        .localCheckpoint(true)
      frontierRows = next.count()
      if (frontierRows > 0) frontiers += next
      frontier = next
    }
    e.unpersist(blocking = false)
    frontiers.reduce(_ union _)
  }

  /** Landmark CLOSENESS estimates off a [[multiSourceHops]] result:
    * per node, how many landmarks reach it and the harmonic-style
    * closeness 10⁶·n_landmarks ÷ Σdist (exact integer division; 0 when
    * every reaching landmark is the node itself). The standard
    * landmark approximation of closeness centrality — exact closeness
    * is all-pairs and does not exist at 100 TB. One skinny node-keyed
    * aggregation over |landmarks|·|reached| rows. */
  def closeness(dists: DataFrame): DataFrame =
    dists.groupBy("node")
      .agg(count(lit(1)).as("n_landmarks"),
        sum(col("dist")).as("sum_dist"))
      .withColumn("closeness_e6",
        when(col("sum_dist") > 0,
          expr("(1000000 * n_landmarks) div sum_dist")).otherwise(lit(0L)))
}
