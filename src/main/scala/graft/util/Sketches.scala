package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable sketches for 100 TB-scale profiling — HyperLogLog
  * distinct counting (Flajolet et al. 2007) and Count-Min frequency
  * estimation (Cormode & Muthukrishnan 2005) — built DETERMINISTIC
  * and oracle-replayable, which stock sketch libraries are not:
  *
  *  - hashes are the house md5 scheme (13 hex chars = 52 portable
  *    bits), so DuckDB recomputes every register/counter bit-for-bit;
  *  - sketch STATE is exact integers under order-independent
  *    aggregates (register = MAX of rhos, counter = SUM), so state is
  *    invariant to partitioning and mergeable by construction — the
  *    whole point of a sketch on a cluster;
  *  - rho (leading-zero rank) is computed from the INTEGER bit length
  *    (`length(bin(v))` / `length(printf('%b', v))`), never
  *    floor(log2(·)) whose boundary ulps differ across engines;
  *  - HLL's one float — the harmonic-mean estimate — divides by an
  *    integer-EXACT scaled sum `S = Σ 2^(w+1 − M_j)` (M_j ≤ w+1, so
  *    the smallest term is exactly 1; register count ≤ 2^11 keeps S
  *    inside a long), making the estimate a pure function of exact
  *    ints on both sides.
  */
object Sketches {

  /** 52-bit md5-derived hash of the rendered key (the
    * [[Sampling.hashKeep]] scheme: '|'-joined casts + seed). Shared
    * within the package — [[Kmv]] sketches the same hash, and the two
    * sketch families must never drift apart. */
  private[graft] def h52(seed: Long, keyCols: Seq[Column]): Column = {
    val key = keyCols.map(_.cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    conv(substring(md5(concat(key, lit("|"), lit(seed.toString))), 1, 13),
      16, 10).cast("long")
  }

  /** JVM twin of [[h52]] for driver/stateful-kernel code (`key` is the
    * already-'|'-joined rendering of the key columns): md5("key|seed"),
    * first 13 hex chars as a 52-bit long. ONE implementation — every
    * JVM-side consumer (streaming state kernels, sign matrices) must
    * call this, or the engines drift one register at a time. */
  private[graft] def h52Long(seed: Long, key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$key|$seed".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16)
  }

  /** (register index, rho) of a 52-bit hash under b index bits: rho =
    * leading zeros of the low w bits + 1, capped at w+1 for v = 0 —
    * from the INTEGER bit length, never floor(log2). */
  private[graft] def idxRho(h: Column, b: Int): (Column, Column) = {
    val w = 52 - b
    val v = h.bitwiseAND(lit((1L << w) - 1))
    val rho = when(v === 0L, lit(w + 1))
      .otherwise(lit(w) - length(bin(v)) + 1)
    (shiftright(h, w), rho.cast("int"))
  }

  /** HyperLogLog register table: `m = 2^b` rows (occupied registers
    * only) of (idx, r) where r = max over the register's keys of
    * (leading-zero count of the low w = 52−b hash bits) + 1, capped at
    * w+1 for v = 0. One map-side-combined groupBy — the corpus never
    * shuffles raw keys, only ≤ m skinny rows. Registers from disjoint
    * row sets MERGE by max(r) per idx (union semantics) — spec-pinned.
    *
    * @param b register-index bits, 4 ≤ b ≤ 11 (m ≤ 2048 keeps the
    *          estimate's scaled sum exactly representable in a long) */
  def hllRegisters(df: DataFrame, keyCols: Seq[String], b: Int,
                   seed: Long): DataFrame = {
    require(b >= 4 && b <= 11, s"hll: b in [4, 11], got $b")
    val (idx, rho) = idxRho(h52(seed, keyCols.map(col)), b)
    df.select(idx.as("idx"), rho.as("rho"))
      .groupBy("idx").agg(max("rho").as("r"))
  }

  /** The HLL estimate from a register table: one row
    * (m, n_zero, s_scaled, est_e6) where `s_scaled = Σ_j 2^(w+1 − M_j)`
    * over ALL m registers (absent idx ⇒ M = 0) is the exact-integer
    * scaled harmonic sum, and
    * `est = α_m · m² · 2^(w+1) / s_scaled` with linear counting below
    * 2.5·m when empty registers remain (the original HLL small-range
    * correction). est_e6 = round(est · 10⁶) — the only float, derived
    * from exact ints identically on both sides. */
  def hllEstimate(registers: DataFrame, b: Int): DataFrame =
    hllEstimateGrouped(registers, Seq.empty, b)

  /** Per-COLUMN HLL registers in ONE scan: each row explodes to
    * (col_name, rendered value) pairs — the Expand shape Catalyst uses
    * for multi-column DISTINCT, but feeding bounded register state
    * instead of shuffling every distinct value. NULLs are skipped
    * (distinct counts ignore NULL, matching `count(DISTINCT c)`). */
  def hllRegistersByColumn(df: DataFrame, cols: Seq[String], b: Int,
                           seed: Long): DataFrame = {
    require(cols.nonEmpty, "hllByColumn: at least one column")
    require(b >= 4 && b <= 11, s"hll: b in [4, 11], got $b")
    val pairs = df.select(explode(array(cols.map(c =>
        struct(lit(c).as("col"), col(c).cast("string").as("v"))): _*)).as("e"))
      .filter(col("e.v").isNotNull)
      .select(col("e.col").as("col"), h52(seed, Seq(col("e.v"))).as("h"))
    val (idx, rho) = idxRho(col("h"), b)
    pairs.select(col("col"), idx.as("idx"), rho.as("rho"))
      .groupBy("col", "idx").agg(max("rho").as("r"))
  }

  /** [[hllEstimate]] per group — registers carry extra key columns
    * (e.g. the `col` tag of [[hllRegistersByColumn]]). */
  def hllEstimateGrouped(registers: DataFrame, groupCols: Seq[String],
                         b: Int): DataFrame = {
    require(b >= 4 && b <= 11, s"hll: b in [4, 11], got $b")
    val m = 1 << b
    val w = 52 - b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__occ"),
        // scaled by 2^(w+1), NOT 2^w: rho caps at w+1 (all-zero low
        // bits), whose term 2^(w-r) would be a NEGATIVE shift — Spark
        // silently produces 1L << 63 and DuckDB throws. At 2^(w+1) the
        // smallest term is exactly 1 and the sum still fits a long
        // (m·2^(w+1) = 2^53 at b = 11).
        expr(s"sum(shiftleft(1L, ${w + 1} - r))").as("__sOcc"))
      .select(groupCols.map(col) ++ Seq(
        lit(m).as("m"),
        (lit(m) - col("__occ")).cast("long").as("n_zero"),
        (col("__sOcc") + (lit(m) - col("__occ")) * lit(1L << (w + 1))).as("s_scaled")): _*)
      .withColumn("__raw",
        lit(alpha) * lit(m.toDouble) * lit(m.toDouble) * lit(math.pow(2.0, w + 1)) /
          col("s_scaled").cast("double"))
      .withColumn("est_e6", round(
        when(col("__raw") <= lit(2.5 * m) && col("n_zero") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("n_zero").cast("double")))
          .otherwise(col("__raw")) * lit(1e6)).cast("long"))
      .select(groupCols.map(col) ++ Seq(col("m"), col("n_zero"),
        col("s_scaled"), col("est_e6")): _*)
  }

  /** HLL set-OVERLAP estimation (inclusion–exclusion over register
    * unions): |A ∩ B| ≈ est(A) + est(B) − est(A ∪ B), where the union
    * sketch is the per-register MAX of the two sides' registers — the
    * property that makes this work across shards with NO exact
    * distinct sets ever materialized (the audience-overlap /
    * cross-source-contamination question at corpus scale). All three
    * estimates come from the same exact-integer register algebra as
    * [[hllEstimate]]; the intersection is derived e6-integer
    * arithmetic (can go ≤ 0 within sketch noise for disjoint sets —
    * returned raw, callers clamp).
    * @return one row: (est_a_e6, est_b_e6, est_union_e6, est_inter_e6) */
  def hllOverlap(a: DataFrame, bSide: DataFrame, keyCols: Seq[String],
                 b: Int, seed: Long): DataFrame = {
    val ra = hllRegisters(a, keyCols, b, seed)
    val rb = hllRegisters(bSide, keyCols, b, seed)
    val ru = ra.unionByName(rb).groupBy("idx").agg(max("r").as("r"))
    val tagged = ra.withColumn("side", lit("a"))
      .unionByName(rb.withColumn("side", lit("b")))
      .unionByName(ru.withColumn("side", lit("u")))
    hllEstimateGrouped(tagged, Seq("side"), b)
      .groupBy()
      .agg(max(when(col("side") === "a", col("est_e6"))).as("est_a_e6"),
        max(when(col("side") === "b", col("est_e6"))).as("est_b_e6"),
        max(when(col("side") === "u", col("est_e6"))).as("est_union_e6"))
      .withColumn("est_inter_e6",
        col("est_a_e6") + col("est_b_e6") - col("est_union_e6"))
  }

  /** Count-Min sketch table: `depth × width` counters (occupied only)
    * — (row, idx, c) with c = Σ weight (default 1 per input row). Each
    * of the `depth` hash rows uses an independent seed derivative.
    * Exact integers under SUM: partition-invariant, mergeable by
    * adding counters (spec-pinned). The corpus collapses to ≤
    * depth·width skinny rows in one map-side-combined aggregate per
    * row... all rows in ONE pass via explode of the depth sequence. */
  def cmsCounters(df: DataFrame, keyCols: Seq[String], depth: Int, width: Int,
                  seed: Long, weightCol: Option[String] = None): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2, s"cms: bad depth/width $depth/$width")
    val wcol = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    df.select(explode(sequence(lit(0), lit(depth - 1))).as("row"),
        struct(keyCols.map(col): _*).as("__k"), wcol.as("__w"))
      .select(col("row"),
        pmod(h52(seed, keyCols.indices.map(i => col("__k")(keyCols(i))) :+ col("row")),
          lit(width.toLong)).as("idx"),
        col("__w"))
      .groupBy("row", "idx").agg(sum("__w").as("c"))
  }

  /** Point estimates for `queries` (a frame carrying the key columns):
    * est = MIN over the depth rows of that row's counter — the CMS
    * overestimate guarantee (est ≥ true count, spec-pinned). */
  def cmsEstimate(counters: DataFrame, queries: DataFrame, keyCols: Seq[String],
                  depth: Int, width: Int, seed: Long): DataFrame = {
    require(depth >= 1 && depth <= 8 && width >= 2, s"cms: bad depth/width $depth/$width")
    queries.select((keyCols.map(col) :+
        explode(sequence(lit(0), lit(depth - 1))).as("row")): _*)
      .withColumn("idx",
        pmod(h52(seed, keyCols.map(col) :+ col("row")), lit(width.toLong)))
      .join(counters, Seq("row", "idx"), "left")
      .na.fill(0L, Seq("c"))
      .groupBy(keyCols.map(col): _*)
      .agg(min("c").as("est"))
  }
}
