package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998)
  * — the standard diversification pass a serving layer runs over a
  * recommender's candidate list: greedily pick the item maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈S} sim(c, s)` against the already-picked
  * set S. Fixed λ = 1/2 so the argmax is over the INTEGER
  * `mmr2x(c) = rel(c) − max sim(c, s)` (2× the λ=.5 score — the
  * doubling preserves the argmax and keeps every value an exact
  * BIGINT that replays bit-for-bit in the DuckDB oracle; ties break
  * by item_id ascending, so the greedy trajectory is total-ordered).
  *
  * Scale anatomy: MMR is inherently sequential PER USER but trivially
  * parallel ACROSS users. Candidate lists are small by construction
  * (a re-ranker sees the top-N of a first-stage retriever, N ≤ ~100),
  * so the kernel is:
  *   1. one self-join of the candidate table on user_id restricted to
  *      ia < ib, inner-joined to `sims` — emits ONLY candidate pairs
  *      with nonzero similarity, ≤ N(N−1)/2 rows per user;
  *   2. two map-side-combined collect_list groupBys (candidates,
  *      edges) + one join — per-user state is O(N + N²·density);
  *   3. the greedy walk runs inside one task per user partition, like
  *      [[graft.stream.Funnel.windowFunnel]]'s sorted walk — no
  *      driver collect, no cross-user barrier.
  * A per-user candidate cap upstream (the first-stage top-N) is the
  * scale dial; the walk itself is O(k·N) per user with k picks.
  */
object Mmr {

  case class Cand(item_id: Long, score: Long)
  case class Edge(ia: Long, ib: Long, sim: Long)

  /** @param cands (user_id, item_id, score) candidate rows — score is
    *              the first-stage relevance, integer-scaled
    * @param sims  (item_a < item_b, sim) integer-scaled similarities;
    *              absent pairs mean sim 0
    * @param k     picks per user (fewer if the list is shorter)
    * @return (user_id, item_id, pick 1-based, mmr2x) */
  def diversify(cands: DataFrame, sims: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "mmr: k must be positive")
    val spark = cands.sparkSession
    import spark.implicits._
    val c = cands.select(col("user_id"), col("item_id"), col("score"))
    val edges = c.select(col("user_id"), col("item_id").as("ia"))
      .join(c.select(col("user_id"), col("item_id").as("ib")), Seq("user_id"))
      .filter(col("ia") < col("ib"))
      .join(sims.select(col("item_a").as("ia"), col("item_b").as("ib"), col("sim")),
        Seq("ia", "ib")) // inner: absent pair == sim 0, no edge needed
      .groupBy("user_id")
      .agg(collect_list(struct(col("ia"), col("ib"), col("sim"))).as("edges"))
    c.groupBy("user_id")
      .agg(collect_list(struct(col("item_id"), col("score"))).as("cs"))
      .join(edges, Seq("user_id"), "left")
      .select(col("user_id"), col("cs"), col("edges"))
      .as[(Long, Seq[Cand], Seq[Edge])]
      .flatMap { case (user, cs, edgesOrNull) =>
        val sim = Option(edgesOrNull).getOrElse(Seq.empty).iterator
          .flatMap(e => Iterator((e.ia, e.ib) -> e.sim, (e.ib, e.ia) -> e.sim))
          .toMap
        var remaining = cs.sortBy(c => (-c.score, c.item_id)).toVector
        var selected = Vector.empty[Long]
        val out = Vector.newBuilder[(Long, Long, Int, Long)]
        var pick = 1
        while (pick <= k && remaining.nonEmpty) {
          // argmax over (mmr2x DESC, item_id ASC) — first step has
          // S = ∅ so mmr2x = score and the sort order already wins
          var best: Cand = null
          var bestM = Long.MinValue
          remaining.foreach { cnd =>
            val maxSim =
              if (selected.isEmpty) 0L
              else selected.map(s => sim.getOrElse((cnd.item_id, s), 0L)).max
            val m = cnd.score - maxSim
            if (m > bestM || (m == bestM && (best == null || cnd.item_id < best.item_id))) {
              best = cnd; bestM = m
            }
          }
          out += ((user, best.item_id, pick, bestM))
          selected :+= best.item_id
          remaining = remaining.filterNot(_.item_id == best.item_id)
          pick += 1
        }
        out.result()
      }
      .toDF("user_id", "item_id", "pick", "mmr2x")
  }
}
