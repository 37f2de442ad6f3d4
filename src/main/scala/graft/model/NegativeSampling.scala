package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.DenseIndex

/** Seeded uniform negative sampling for implicit-feedback training —
  * the data-generation step every BPR/SGNS-style recommender loss
  * needs: for each user, `k` items they have NOT interacted with,
  * drawn uniformly from the catalog, deterministically (the same seed
  * reproduces the same training set on any cluster — the repo-wide
  * seeded-md5 discipline, cf. `framework/` splits which the reference
  * seeds the same way via NumPy).
  *
  * The naive encodings both die at scale: `users × items` cross join
  * then per-user shuffle is quadratic; per-user `rand()` is
  * partitioning-dependent. This kernel never materializes the catalog
  * per user:
  *   1. items get a dense 1..N index ([[DenseIndex]] — decomposed,
  *      no single-partition sort);
  *   2. each user emits `k·oversample` DRAWS narrowly
  *      (explode(sequence)), draw i hashing to
  *      `md5(user|i|seed) mod N + 1` — a constant-width row
  *      amplification, not a catalog scan;
  *   3. draws map to items through one equi-join on idx, collapse
  *      duplicates to their first draw (min i), anti-join the user's
  *      seen set, rank by (first-draw, item) and keep `k`.
  *
  * `oversample` is the dial against duplicate draws and seen-item
  * rejections; a heavy user can still end with fewer than `k`
  * negatives — callers that need exactness raise it (the same
  * contract as rejection sampling everywhere). The 32-bit-hash mod-N
  * bias is the standard ≤ N/2³² relative skew — negligible for any
  * real catalog.
  *
  * @return (user_id, item_id, neg_rank 1..≤k) */
object NegativeSampling {

  def uniformNegatives(ratings: DataFrame, k: Int, oversample: Int,
                       seed: Long): DataFrame = {
    require(k >= 1 && oversample >= 1, "negatives: k and oversample must be positive")
    val idx = DenseIndex.byKey(ratings.select("item_id").distinct(), "item_id")
    val n = idx.count()
    val draws = ratings.select("user_id").distinct()
      .select(col("user_id"), explode(expr(s"sequence(1, ${k * oversample})")).as("i"))
    val cand = draws.select(col("user_id"), col("i"),
      (conv(substring(md5(concat(
        col("user_id").cast("string"), lit("|"),
        col("i").cast("string"), lit("|"), lit(seed.toString))), 1, 8), 16, 10)
        .cast("long") % n + 1L).as("idx"))
    val mapped = cand.join(idx, Seq("idx"))
      .groupBy("user_id", "item_id").agg(min("i").as("fi"))
    val unseen = mapped.join(ratings.select("user_id", "item_id"),
      Seq("user_id", "item_id"), "left_anti")
    graft.util.TopK.perGroup(
      unseen.withColumn("negfi", -col("fi")), // TopK ranks DESC; first draw wins
      Seq("user_id"), "negfi", Seq("item_id"), k)
      .select(col("user_id"), col("item_id"), col("rank").as("neg_rank"))
  }
}
