package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Fixed-iteration HITS (hubs & authorities, Kleinberg 1999) in EXACT
  * scaled-integer arithmetic — the second classic link-analysis score
  * next to [[PageRank]], and the one that separates the two ROLES a
  * node plays in a directed KG: users/subjects that point at many
  * good objects (hubs) vs items/properties pointed at by many good
  * subjects (authorities). Float HITS cannot hash-match across
  * engines; this one replays bit-for-bit.
  *
  * Per round (mutual recursion, L1 rescale in fixed-point):
  *   a_raw(v) = Σ_{u→v} h(u)      ; a = a_raw·scale div Σ a_raw
  *   h_raw(u) = Σ_{u→v} a(v)      ; h = h_raw·scale div Σ h_raw
  * Every node starts at h = scale. The rescale keeps each vector's
  * L1 mass at ~scale, so values stay bounded: the overflow constraint
  * is maxdeg·scale² < 2^63 after round 1 (N·scale² for the
  * unnormalized first round) — at the default scale 1e6 that is
  * ~9·10⁶ nodes/degree; drop `scale` for larger graphs. Integer div
  * floors identically in any engine (all values nonnegative).
  *
  * Physical design: same discipline as [[PageRank]] — labels
  * dictionary-encoded to longs over a persisted dictionary, the edge
  * list hash-partitioned ONCE and persisted, score tables kept SPARSE
  * (only nodes with in-/out-edges carry a row; zeros materialize only
  * at the final label join-back), size-gated broadcasts, and an eager
  * localCheckpoint per half-round to keep lineage flat. The L1 sums
  * ride as single-row broadcast cross-joins against the checkpointed
  * raw table — no driver-side collect in the loop.
  */
object Hits {

  /** Returns (node, hub_e, auth_e) — one row per distinct endpoint,
    * both scores in `scale` fixed-point after `iters` full rounds. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int, scale: Long = 1000000L,
          broadcastMaxNodes: Long = 1000000L): DataFrame = {
    require(iters >= 1, "hits: iters >= 1")
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("t"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("s").as("n")).union(e.select(col("t").as("n"))).distinct()
    val nid = nodes.withColumn("nid", monotonically_increasing_id())
      // eager localCheckpoint (not persist): eviction/recompute would
      // re-draw the arbitrary ids and mis-wire the label join-back
      .localCheckpoint(true)
    val nNodes = nid.count()
    val small = nNodes <= broadcastMaxNodes
    def gate(df: DataFrame) = if (small) broadcast(df) else df
    val enBase = e
      .join(gate(nid.select(col("n").as("s"), col("nid").as("sid"))), "s")
      .join(gate(nid.select(col("n").as("t"), col("nid").as("tid"))), "t")
      .select("sid", "tid")
    // the two half-rounds aggregate on OPPOSITE keys, so one cache
    // cannot serve both: under the gate (score tables broadcast) keep
    // two copies — sid-partitioned for the hub half (groupBy sid) and
    // tid-partitioned for the auth half (groupBy tid); each half-round
    // then plans ZERO exchanges (HashPartitioning(k) satisfies its
    // groupBy(k); a checkpointed score table has no size statistics,
    // so AQE never discovers the broadcast). Above the gate a single
    // sid-partitioned cache serves the shuffle joins and only the
    // skinny score tables move.
    val en = enBase
      .repartition(col("sid"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val enT =
      if (small) enBase.repartition(col("tid")).persist(StorageLevel.MEMORY_AND_DISK)
      else en

    def l1norm(raw: DataFrame, idCol: String, rawCol: String, outCol: String): DataFrame = {
      val r = raw.localCheckpoint(true)
      r.crossJoin(broadcast(r.agg(sum(col(rawCol)).as("__S"))))
        .select(col(idCol), expr(s"$rawCol * ${scale}L div __S").as(outCol))
        .localCheckpoint(true)
    }

    var hubs = nid.select(col("nid"), lit(scale).as("h"))
    var auths: DataFrame = null
    for (_ <- 0 until iters) {
      // groupBy would keep the grouping column's expression id, making
      // the next round's join condition a trivially-true self-compare;
      // the rename mints a fresh id so every join is unambiguous.
      auths = l1norm(
        enT.join(gate(hubs), enT("sid") === hubs("nid"))
          .groupBy("tid").agg(sum("h").as("raw"))
          .withColumnRenamed("tid", "nid"),
        "nid", "raw", "a")
      hubs = l1norm(
        en.join(gate(auths), en("tid") === auths("nid"))
          .groupBy("sid").agg(sum("a").as("raw"))
          .withColumnRenamed("sid", "nid"),
        "nid", "raw", "h")
    }
    val out = nid
      .join(gate(hubs), nid("nid") === hubs("nid"), "left")
      .join(gate(auths), nid("nid") === auths("nid"), "left")
      .select(col("n").as("node"),
        coalesce(col("h"), lit(0L)).as("hub_e"),
        coalesce(col("a"), lit(0L)).as("auth_e"))
    e.unpersist(blocking = false)
    en.unpersist(blocking = false)
    if (small) enT.unpersist(blocking = false)
    out
  }
}
