package graft.util

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketch with SET-ALGEBRA estimators
  * — Beyer et al., "On synopses for distinct-value estimation under
  * multiset operations" (SIGMOD 2007). Complements the HLL family
  * ([[Sketches]]): HLL unions by register-max and gets intersections
  * only by inclusion–exclusion (q195), which has no set-DIFFERENCE
  * form and degrades for asymmetric sides; a KMV synopsis supports
  * union, intersection AND difference directly, because the k
  * smallest hashes of A ∪ B are a uniform coordinated sample of the
  * distinct-hash universe on which membership in A and B is exactly
  * testable.
  *
  * House determinism rules (the [[Sketches]] discipline):
  *  - hashes are the md5 52-bit scheme ([[Sketches.h52]] semantics),
  *    so DuckDB recomputes every sketch element bit-for-bit;
  *  - sketch STATE is the k smallest DISTINCT hash values — a pure
  *    function of the input SET, invariant to row order, partitioning
  *    and duplication, and mergeable by "k smallest of the union"
  *    (spec-pinned);
  *  - every estimate is e6-scaled and derived from exact integers by
  *    one double expression evaluated identically on both engines
  *    (the [[Sketches.hllEstimate]] precedent).
  *
  * Physical shape: the k-smallest-distinct state is built by a custom
  * typed [[Aggregator]] (registered through `functions.udaf`) whose
  * partial state is a sorted array of ≤ k longs — each partition
  * ships AT MOST k values into the final merge, the map-side-combine
  * property that makes this a sketch. No builtin aggregate has this
  * shape: `collect_set` carries the full distinct set through the
  * shuffle (unbounded state), and `orderBy.limit(k)` after a
  * `distinct()` still shuffles every distinct hash once. This is the
  * "custom TypedColumn for agg functions" tier of the extension
  * ladder, justified exactly like the Bloom probe in
  * [[ScaleJoins]] — Spark has no public bounded-top-k aggregate.
  *
  * Estimator (hashes uniform on [0, 2^52)): with n = |sketch|,
  *   n < k  → the sketch holds EVERY distinct hash: estimate = n
  *            exactly;
  *   n = k  → D̂ = (k−1) · 2^52 / h_(k)  (the unbiased KMV form).
  * Set ops over the UNION synopsis K_u (k smallest of A ∪ B, with
  * threshold τ = max K_u ≤ both sides' own thresholds, so membership
  * h ∈ A ⟺ h ∈ K_A holds for every h ∈ K_u):
  *   ρ∩ = |{h ∈ K_u : h ∈ K_A ∧ h ∈ K_B}| / |K_u|, |A∩B|^ = ρ∩ · D̂_u
  *   ρ\  = |{h ∈ K_u : h ∈ K_A ∧ h ∉ K_B}| / |K_u|, |A\B|^ = ρ\ · D̂_u
  *
  * Reference ground: the same corpus-overlap / churn questions as
  * q195 (`/root/reference/framework/dataloader/loader.py` materializes
  * exact user sets per split to diff them — exact difference is the
  * operation that stops scaling first).
  */
object Kmv {

  /** Max supported k — keeps the merged state small enough to ride in
    * a single aggregation buffer row comfortably. */
  val MaxK = 8192

  /** Bounded-state aggregator: sorted array of the ≤ k smallest
    * DISTINCT input longs. reduce is O(log k) search + O(k) insert
    * only when the value beats the current k-th minimum (rare after
    * warm-up); merge is one linear merge of two sorted arrays. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    override def zero: Array[Long] = Array.empty[Long]

    override def reduce(b: Array[Long], a: Long): Array[Long] = {
      val n = b.length
      if (n == k && a >= b(n - 1)) return b
      val pos = java.util.Arrays.binarySearch(b, a)
      if (pos >= 0) return b // already present
      val ins = -pos - 1
      val outLen = math.min(n + 1, k)
      val out = new Array[Long](outLen)
      System.arraycopy(b, 0, out, 0, ins)
      out(ins) = a
      System.arraycopy(b, ins, out, ins + 1, outLen - ins - 1)
      out
    }

    override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      if (b1.isEmpty) return b2
      if (b2.isEmpty) return b1
      val out = new Array[Long](math.min(b1.length + b2.length, k))
      var i = 0; var j = 0; var o = 0; var last = Long.MinValue
      while (o < out.length && (i < b1.length || j < b2.length)) {
        val v =
          if (j >= b2.length || (i < b1.length && b1(i) <= b2(j))) { val x = b1(i); i += 1; x }
          else { val x = b2(j); j += 1; x }
        if (o == 0 || v != last) { out(o) = v; o = o + 1; last = v }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One-row synopsis: `ks` = sorted array of the k smallest distinct
    * key hashes (NULL-rendering keys dropped, matching
    * `count(DISTINCT …)`). Shuffle volume: ≤ k longs per partition. */
  def sketch(df: DataFrame, keyCols: Seq[String], k: Int, seed: Long): DataFrame = {
    require(k >= 2 && k <= MaxK, s"kmv: k in [2, $MaxK], got $k")
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select(Sketches.h52(seed, keyCols.map(col)).as("h"))
      .filter(col("h").isNotNull)
      .agg(kmv(col("h")).as("ks"))
  }

  /** Per-GROUP synopses in one aggregation: (groupCols…, ks) — the
    * [[Sketches.hllEstimateGrouped]] sibling. Each group's state is an
    * independent ≤ k-long array riding the same map-side-combined
    * aggregate, so shuffle volume is ≤ k longs per (partition, group). */
  def sketchGrouped(df: DataFrame, groupCols: Seq[String], keyCols: Seq[String],
                    k: Int, seed: Long): DataFrame = {
    require(k >= 2 && k <= MaxK, s"kmv: k in [2, $MaxK], got $k")
    require(groupCols.nonEmpty, "kmv.sketchGrouped: at least one group column")
    val kmv = udaf(new KmvAgg(k), Encoders.scalaLong)
    df.select((groupCols.map(col) :+ Sketches.h52(seed, keyCols.map(col)).as("h")): _*)
      .filter(col("h").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(kmv(col("h")).as("ks"))
  }

  /** Per-group distinct estimates: (groupCols…, n_kept, est_e6) —
    * n_kept = |synopsis| (exact count when < k), est_e6 the e6-scaled
    * estimate under the [[sketch]] estimator. */
  def estimateGrouped(df: DataFrame, groupCols: Seq[String], keyCols: Seq[String],
                      k: Int, seed: Long): DataFrame =
    sketchGrouped(df, groupCols, keyCols, k, seed)
      .select((groupCols.map(col) :+
        size(col("ks")).cast("long").as("n_kept") :+
        round(estE6(col("ks"), k)).cast("long").as("est_e6")): _*)

  /** e6-scaled distinct estimate from a sketch array column: exact n
    * when the sketch is not full, else (k−1)·2^52/h_(k). Public: the
    * [[IncrementalAgg]] churn surface derives its estimates from the
    * same expression so the engines can never disagree. */
  def estE6(arr: Column, k: Int): Column =
    when(size(arr) < k, size(arr).cast("double") * lit(1e6))
      .otherwise(lit((k - 1).toDouble) * lit(4503599627370496.0) /
        element_at(arr, k).cast("double") * lit(1e6))

  /** Full set algebra of two keyed sets in ONE row:
    * (n_a, n_b, n_u, est_a_e6, est_b_e6, est_union_e6,
    *  k_inter, est_inter_e6, k_diff, est_diff_e6) where diff = A \ B.
    * The two 1-row synopses cross-join (broadcast, bounded) and every
    * derived figure is array arithmetic on ≤ k-long arrays. */
  def setOps(a: DataFrame, bSide: DataFrame, keyCols: Seq[String],
             k: Int, seed: Long): DataFrame = {
    val sa = sketch(a, keyCols, k, seed).withColumnRenamed("ks", "ka")
    val sb = sketch(bSide, keyCols, k, seed).withColumnRenamed("ks", "kb")
    sa.crossJoin(sb)
      .withColumn("ku", slice(array_sort(array_distinct(
        concat(col("ka"), col("kb")))), 1, k))
      .withColumn("inter_u", array_intersect(array_intersect(col("ku"), col("ka")), col("kb")))
      .withColumn("diff_u", array_except(array_intersect(col("ku"), col("ka")), col("kb")))
      .select(
        size(col("ka")).cast("long").as("n_a"),
        size(col("kb")).cast("long").as("n_b"),
        size(col("ku")).cast("long").as("n_u"),
        round(estE6(col("ka"), k)).cast("long").as("est_a_e6"),
        round(estE6(col("kb"), k)).cast("long").as("est_b_e6"),
        round(estE6(col("ku"), k)).cast("long").as("est_union_e6"),
        size(col("inter_u")).cast("long").as("k_inter"),
        // empty-union guard (both inputs empty): the ratio would be
        // 0/0 — NULL here, NaN in a replaying engine; the true
        // estimate for an empty union is exactly 0
        when(size(col("ku")) > 0,
          round(size(col("inter_u")).cast("double") / size(col("ku")).cast("double") *
            estE6(col("ku"), k)).cast("long")).otherwise(lit(0L)).as("est_inter_e6"),
        size(col("diff_u")).cast("long").as("k_diff"),
        when(size(col("ku")) > 0,
          round(size(col("diff_u")).cast("double") / size(col("ku")).cast("double") *
            estE6(col("ku"), k)).cast("long")).otherwise(lit(0L)).as("est_diff_e6"))
  }
}
