package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Market-basket frequent itemsets (Agrawal & Srikant's a-priori,
  * 1994) over the capped relevant set — the classic "bought together"
  * analytics the co-occurrence pair family (q124/q150) stops one
  * level short of. Pairs are [[ItemKnn.cooc]]; this adds the 3-item
  * tier with the a-priori bound: a triple can only be frequent if all
  * THREE of its sub-pairs are, so the user-basket enumeration join is
  * pruned by the frequent-pair table at every step — never a raw
  * C(cap, 3) explode.
  *
  * Scale shape: per-user fanout is bounded by the cap (≤ C(cap, 2)
  * candidate extensions per basket item) AND by the pair prune —
  * frequent pairs are broadcast-or-shuffle equi-joins, support is one
  * map-side-combined count. The same caps-as-dials story as the
  * itemKNN chain; SQL-replayable verbatim (q165).
  */
object Baskets {

  /** Frequent triples: (item_a < item_b < item_c, support ≥
    * `minSupport`), support counted over distinct capped user baskets. */
  def frequentTriples(ratings: DataFrame, minRating: Double, cap: Int,
                      minSupport: Int): DataFrame = {
    val rel = ItemKnn.relevantCapped(ratings, minRating, cap)
    frequentTriplesFrom(rel, ItemKnn.cooc(rel, minSupport), minSupport)
  }

  /** [[frequentTriples]] from PRE-BUILT rel/cooc tables — the shared-
    * materialization entry point (the ItemKnn.similaritiesFrom
    * precedent): callers that already hold the capped relevant set and
    * the support-pruned pair table (the r14 cross-query memo chain)
    * skip rebuilding both. `coocPairs` must be cooc(rel, m) with
    * m ≤ minSupport — definitionally true for the shared memo. */
  def frequentTriplesFrom(rel: DataFrame, coocPairs: DataFrame,
                          minSupport: Int): DataFrame = {
    require(minSupport >= 1, "baskets: minSupport >= 1")
    val pairs = coocPairs
      .filter(col("cooc") >= minSupport.toLong)
      .select("item_a", "item_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a-priori one level down: every member of a frequent triple sits
    // in some frequent pair, so basket rows on infrequent items can
    // never contribute — semi-join them away BEFORE the 3-way join
    // (at sparse supports this collapses the enumeration input)
    val freqItems = pairs.select(col("item_a").as("item_id"))
      .union(pairs.select(col("item_b").as("item_id"))).distinct()
    val relF = rel.join(freqItems, Seq("item_id"), "left_semi")
    val r1 = relF.select(col("user_id"), col("item_id").as("a"))
    val r2 = relF.select(col("user_id"), col("item_id").as("b"))
    val r3 = relF.select(col("user_id"), col("item_id").as("c"))
    val out = r1.join(r2, Seq("user_id")).filter(col("a") < col("b"))
      .join(pairs.select(col("item_a").as("a"), col("item_b").as("b")), Seq("a", "b"))
      .join(r3, Seq("user_id")).filter(col("b") < col("c"))
      .join(pairs.select(col("item_a").as("b"), col("item_b").as("c")), Seq("b", "c"))
      .join(pairs.select(col("item_a").as("a"), col("item_b").as("c")), Seq("a", "c"))
      .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport.toLong)
      .select(col("a").as("item_a"), col("b").as("item_b"),
        col("c").as("item_c"), col("support"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then drop the 4-times-referenced pair cache
    pairs.unpersist(blocking = false)
    out
  }
}
