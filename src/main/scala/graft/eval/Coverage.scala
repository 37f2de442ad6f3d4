package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Beyond-accuracy recommender evaluation: catalog coverage, Gini
  * concentration, per-user novelty and intra-list diversity — the
  * metric family every recommender evaluation suite reports next to
  * MAP/nDCG (the reference's evaluator — framework/evaluator/
  * metric.py — ships only accuracy metrics; production offline eval
  * adds these four to catch the popularity-collapse failure mode
  * accuracy metrics reward).
  *
  * All set/count metrics are exact scaled integers (the repo-wide
  * cross-engine oracle rule); novelty is the one log-based metric and
  * follows the q12 nDCG precedent (IEEE-double log2, round 6).
  *
  * Scale anatomy:
  *  - coverage/Gini collapse the recommendation table to an item-count
  *    rollup first (one map-side-combined groupBy), then to a
  *    count-of-counts table — the Gini rank sum needs NO per-item
  *    global rank: items tied at count v occupying ranks s+1..s+m
  *    contribute v·(m·s + m(m+1)/2) REGARDLESS of how ties are
  *    ordered, so the only window runs on the distinct-count-values
  *    rollup (bounded by max per-item multiplicity — thousands of
  *    rows where the raw table has billions; the q135 skinny-rollup
  *    pattern).
  *  - novelty joins recs against the (item, popularity) rollup;
  *    intra-list diversity self-joins within user top-k lists — at
  *    most k(k−1)/2 pairs per user, k a small constant.
  *
  * Overflow bound (documented, not checked): the Gini rank sum T ≤
  * n²·maxCnt must stay under 2⁶³/(2·10⁶) ≈ 4.6e12 — holds through
  * ~1e6 distinct recommended items with ~1e6-user head items; widen
  * to DecimalType(38,0) past that (DuckDB's HUGEINT side already is).
  */
object Coverage {

  val Scale = 1000000L

  /** One-row summary: catalog coverage (share of `catalogItems`
    * recommended to anyone) and the Gini index of recommendation
    * counts across recommended items (0 = every recommended item
    * equally often, →1 = all recommendations concentrate on one item).
    *
    * Gini uses the sorted form G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n in
    * exact scaled integers: gini_e6 = (2·T·10⁶) div (n·S) −
    * (10⁶·(n+1)) div n, with T the rank-weighted sum computed from the
    * count-of-counts rollup (see object doc — no per-item rank).
    *
    * @param recs         (user_id, item_id) recommendation rows
    * @param catalogItems (item_id) — the recommendable universe */
  def summary(recs: DataFrame, catalogItems: DataFrame): DataFrame = {
    val cnt = recs.groupBy("item_id").agg(count(lit(1)).as("cnt"))
    val byVal = cnt.groupBy("cnt").agg(count(lit(1)).as("m"))
    // window over the distinct-count-values rollup: skinny by
    // construction (the q135 pattern — never window the raw table)
    val w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)
    val g = byVal
      .withColumn("before", coalesce(sum("m").over(w), lit(0L)))
      .agg(sum(expr("cnt * (m * before + (m * (m + 1)) div 2)")).as("t"),
        sum(col("m")).as("n"), sum(expr("cnt * m")).as("s"))
    val cat = catalogItems.agg(countDistinct("item_id").as("catalog_items"))
    g.crossJoin(cat).select(
      col("catalog_items"),
      col("n").as("recommended_items"),
      expr(s"n * ${Scale}L div catalog_items").as("coverage_e6"),
      expr(s"(2 * t * ${Scale}L) div (n * s) - (${Scale}L * (n + 1)) div n")
        .as("gini_e6"))
  }

  /** Per-user novelty and intra-list diversity →
    * (user_id, novelty, ild_e6).
    *
    *  - novelty = mean self-information of the user's recommended
    *    items, −log2(pop(i)/|U|) with pop = interaction count in
    *    `ratings` and |U| = distinct users (Zhou et al. 2010); higher
    *    = recommending longer-tail items. Double, round 6 (q12
    *    precedent).
    *  - ild_e6 = 10⁶ − mean pairwise similarity over the user's list
    *    under `sims` (item_a < item_b, e6-scaled; absent pair = 0 —
    *    consistent with the itemKNN support prune). Exact integers:
    *    10⁶ − Σsim div nPairs; single-item lists have no pairs and
    *    emit the 10⁶ maximum.
    *
    * @param recs    (user_id, item_id) top-k rows, k small
    * @param ratings full interaction table (user_id, item_id, …)
    * @param sims    (item_a < item_b, sim) e6-scaled similarities */
  def noveltyIld(recs: DataFrame, ratings: DataFrame, sims: DataFrame): DataFrame = {
    val u = ratings.agg(countDistinct("user_id").as("u"))
    val pop = ratings.groupBy("item_id").agg(count(lit(1)).as("pcnt"))
    // inner join: a recommended item always has interactions (it
    // entered the model through them), so pop never misses
    val nov = recs.join(pop, Seq("item_id"))
      .crossJoin(broadcast(u))
      .groupBy("user_id")
      .agg(round(sum(log2(col("u").cast("double") / col("pcnt").cast("double")))
        / count(lit(1)), 6).as("novelty"))
    val prs = recs.select(col("user_id"), col("item_id").as("ia"))
      .join(recs.select(col("user_id"), col("item_id").as("ib")), Seq("user_id"))
      .filter(col("ia") < col("ib"))
      .join(sims.select(col("item_a").as("ia"), col("item_b").as("ib"), col("sim")),
        Seq("ia", "ib"), "left")
      .withColumn("sim", coalesce(col("sim"), lit(0L)))
    val ild = prs.groupBy("user_id")
      .agg(expr(s"${Scale}L - (sum(sim) div count(1))").as("ild_e6"))
    nov.join(ild, Seq("user_id"), "left")
      .select(col("user_id"), col("novelty"),
        coalesce(col("ild_e6"), lit(Scale)).as("ild_e6"))
  }
}
