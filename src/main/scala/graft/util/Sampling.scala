package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-set assembly (driver mandate:
  * large-scale pipeline operations). Every predicate is a pure function
  * of the row's key columns and the seed — reproducible across retries,
  * repartitioning, and cluster-size changes (the same doctrine as
  * `EdgeSplits.portableHash`, SURVEY §4.5), and replayable verbatim in
  * a SQL oracle: the first 8 hex chars of an md5 compare
  * lexicographically exactly like the 32-bit integer they encode, so
  * `keep` becomes a string threshold — no float, no RNG state.
  */
object Sampling {

  /** Keep-predicate: true for ~`keep` of the key space. `keep` strictly
    * in (0, 1); key columns are rendered with '|' separators exactly as
    * `CAST(col AS VARCHAR) || '|' || ...` renders them in the oracle.
    *
    * NULL semantics match SQL concatenation: a NULL key column nulls the
    * whole key, the predicate evaluates NULL, and the row is DROPPED —
    * concat (not concat_ws, which silently skips nulls and would keep or
    * drop every null-key row as one correlated block). Keys containing
    * the '|' separator make multi-column keys ambiguous (('x|y','z') ==
    * ('x','y|z')); both engines render identically so parity holds, but
    * pick separator-free key columns (ids) for independence. */
  def hashKeep(keep: Double, seed: Long, keyCols: Seq[Column]): Column = {
    require(keep > 0 && keep < 1, s"keep must be in (0,1), got $keep")
    val threshold = f"${(keep * 4294967296L).toLong}%08x"
    val key = keyCols.map(_.cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    substring(md5(concat(key, lit("|"), lit(seed.toString))), 1, 8) < lit(threshold)
  }

  /** Hash-Bernoulli sample: keep each row iff [[hashKeep]] holds on its
    * key columns. */
  def bernoulli(df: DataFrame, keep: Double, seed: Long, keyCols: Seq[String]): DataFrame =
    df.filter(hashKeep(keep, seed, keyCols.map(col)))

  /** Class downsample — the negative-sampling step after labeling
    * (positives are rare, negatives are the corpus): rows whose
    * `labelCol` equals `targetClass` are kept at rate `keep`; every
    * other row survives. One narrow codegen'd filter, no shuffle, no
    * count pass. */
  def downsampleClass(df: DataFrame, labelCol: String, targetClass: Int,
                      keep: Double, seed: Long, keyCols: Seq[String]): DataFrame =
    df.filter(col(labelCol) =!= targetClass || hashKeep(keep, seed, keyCols.map(col)))

  /** Temperature-weighted domain mixing — the corpus-composition step of
    * a training run: domain d's share of the sample follows
    * p_d ∝ (Σ weight_d)^alpha (alpha<1 upsamples small domains,
    * alpha=1 is natural mix), and each domain keeps rows at
    * keep_d = min(1, targetFraction · N · p_d / n_d), rounded to 6
    * decimals so the Spark and DuckDB `pow` draws can never disagree at
    * the md5 threshold.
    *
    * The per-row predicate is the same [[hashKeep]] md5 scheme with a
    * per-DOMAIN threshold string: `printf('%08x', floor(keep_d·2^32))`
    * compares lexicographically exactly like the 32-bit value.
    *
    * Scale shape: one partial-aggregated groupBy over the corpus → a
    * domains-sized stats table → broadcast join of the per-domain rate
    * back onto the corpus → narrow filter. No global window, no second
    * pass, nothing driver-side. */
  def domainMix(df: DataFrame, domainCol: String, weightCol: String,
                alpha: Double, targetFraction: Double, seed: Long,
                keyCols: Seq[String]): DataFrame = {
    require(targetFraction > 0 && targetFraction <= 1,
      s"domainMix: targetFraction in (0,1], got $targetFraction")
    val stats = df.groupBy(domainCol)
      .agg(count(lit(1)).cast("double").as("__n"),
        sum(col(weightCol).cast("double")).as("__tok"))
      .withColumn("__w", pow(col("__tok"), alpha))
    val tot = stats.agg(sum("__w").as("__sumw"), sum("__n").as("__bign"))
    val rates = stats.crossJoin(broadcast(tot))
      .select(col(domainCol),
        round(least(lit(1.0),
          lit(targetFraction) * col("__bign") * col("__w") / col("__sumw") / col("__n")), 6)
          .as("keep_rate"))
    val threshold = format_string("%08x",
      floor(col("keep_rate") * 4294967296d).cast("long"))
    val key = keyCols.map(col(_).cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    df.join(broadcast(rates), domainCol)
      .filter(col("keep_rate") >= 1.0 ||
        substring(md5(concat(key, lit("|"), lit(seed.toString))), 1, 8) < threshold)
  }

  /** Deterministic global shuffle into training shards: every row gets
    * a balanced shard id (seeded-md5 mod nShards) and a stable position
    * within its shard (the md5 total order) — the step that turns a
    * corpus into reproducibly-shuffled training files, independent of
    * input partitioning, retries, and cluster size.
    *
    * Scale shape: one hash exchange keyed by shard + a per-shard sort —
    * exactly the cost of writing shuffled shards, nothing extra. The
    * md5 order IS the shuffle: adjacent input rows land in unrelated
    * shard positions. */
  def shard(df: DataFrame, nShards: Int, seed: Long, keyCols: Seq[String]): DataFrame = {
    require(nShards > 0, s"shard: nShards must be positive, got $nShards")
    val key = keyCols.map(col(_).cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    val h = md5(concat(key, lit("|"), lit(seed.toString)))
    df.withColumn("__h", h)
      .withColumn("shard",
        (conv(substring(col("__h"), 1, 8), 16, 10).cast("long") % nShards).cast("int"))
      .withColumn("shard_pos", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("__h"), key)).cast("long"))
      .drop("__h")
  }

  /** Exact-size stratified sample: the first `n` rows of each stratum
    * under the seeded-md5 total order (ties broken by the key render —
    * md5 collisions at 32 hex chars are not a practical concern). Unlike
    * Bernoulli sampling this guarantees per-stratum counts — the shape
    * eval sets and ablation slices need.
    *
    * Ranking runs on the [[TopK]] bounded-heap combine, NOT a window:
    * strata are routinely low-cardinality (a handful of languages over
    * a trillion-row corpus), and `row_number().over(partitionBy(
    * strata))` funnels each stratum through ONE task's sort — the
    * single-task-sort trap this repo documents on q106/q113. The heap
    * keeps n rows of state per stratum per input partition and
    * shuffles only candidates. */
  def stratifiedTake(df: DataFrame, strataCols: Seq[String], n: Int, seed: Long,
                     keyCols: Seq[String]): DataFrame = {
    require(n > 0, s"stratifiedTake: n must be positive, got $n")
    val key = keyCols.map(col(_).cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    val order = md5(concat(key, lit("|"), lit(seed.toString)))
    TopK.perGroup(
      df.withColumn("__ord", order).withColumn("__key", key),
      strataCols, "__ord", Seq("__key"), n, descending = false)
      .drop("__ord", "__key", "rank")
  }

  /** Efraimidis-Spirakis (2006, "Weighted random sampling with a
    * reservoir", algorithm A-ES) selection key: the classic form draws
    * u ~ Uniform(0,1) per row and keeps the n largest `u^(1/w)` — an
    * exact weighted sample without replacement. Here u derives from
    * the house md5 scheme (13 hex chars = 52 bits → `(h+1)/(2^52+1)`
    * ∈ (0,1), never 0 or 1), and the comparison runs on the monotone
    * transform `ln(u)/w` QUANTIZED to e-12 integers: selection becomes
    * an exact-integer order both engines replay identically — the only
    * cross-engine float exposure is a ≤1-ulp `ln` difference landing
    * within 1e-21 of a rounding boundary (≈2e-9 per row). Ties at the
    * e-12 cell break by the id columns, deterministically on both
    * sides. A-ES order is invariant under scaling all weights by a
    * constant, so the e-12 grid suits any weight scale whose keys
    * aren't all inside one cell (|ln(u)/w| ≥ ~1e-9; rescale weights
    * toward ~1 otherwise). */
  def aesKeyE12(seed: Long, weight: Column, keyCols: Seq[Column]): Column = {
    val key = keyCols.map(_.cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    val h = conv(substring(md5(concat(key, lit("|"), lit(seed.toString))), 1, 13),
      16, 10).cast("long")
    val u = (h.cast("double") + lit(1.0)) / lit(4503599627370497.0) // 2^52 + 1
    round(log(u) / weight.cast("double") * lit(1e12)).cast("long")
  }

  /** Weighted reservoir sample of exactly `min(n, rows)` rows,
    * P(row ∈ sample) ∝ weight (without replacement, A-ES). Rows with
    * weight ≤ 0 or NULL are excluded (A-ES is defined on w > 0; a
    * NULL weight nulls the key like a NULL id nulls [[hashKeep]]).
    *
    * Physical strategy, size-gated (value-identical, spec-pinned):
    *  - n ≤ `heapMaxN`: [[TopK]]'s group-limit cut under a constant
    *    group — the WindowGroupLimit partial pass keeps ≤ n rows per
    *    input partition, so the exchange carries only candidates. The
    *    gate default matches `spark.sql.optimizer.windowGroupLimitThreshold`
    *    (1000): above it the rule cannot fire and a single-group window
    *    would funnel the corpus through one task, so —
    *  - larger n: the [[GlobalRank]] bucket decomposition (width_bucket
    *    over an eagerly-probed key min/max) — rank = bucket offset +
    *    within-bucket row_number, at most one bucket's rows per task
    *    sort, never the corpus and never a driver-sized merge.
    * Output: the input columns plus `rank` (1-based, key desc). */
  def weightedReservoir(df: DataFrame, n: Long, weightCol: String,
                        keyCols: Seq[String], seed: Long,
                        heapMaxN: Int = 1000, nBuckets: Int = 1022): DataFrame = {
    require(n > 0, s"weightedReservoir: n must be positive, got $n")
    // NULL key columns null the md5 render and with it the key — drop
    // those rows EXPLICITLY (the hashKeep NULL contract): left in, the
    // bucket path would count them into the cumulative rank offsets
    // (nulls sort first) and then lose them at the bucket join,
    // shifting every surviving rank
    val tagged = df.filter(col(weightCol) > 0)
      .withColumn("__aes", aesKeyE12(seed, col(weightCol), keyCols.map(col)))
      .filter(col("__aes").isNotNull)
    if (n <= heapMaxN)
      TopK.perGroup(tagged.withColumn("__g", lit(1)),
          Seq("__g"), "__aes", keyCols, n.toInt, descending = true)
        .drop("__g", "__aes")
    else {
      val mm = tagged.agg(min("__aes"), max("__aes")).head
      val bucket =
        if (mm.isNullAt(0) || mm.getLong(0) == mm.getLong(1)) lit(0L)
        else width_bucket(-col("__aes"), lit(-mm.getLong(1)), lit(-mm.getLong(0)),
          lit(nBuckets))
      GlobalRank.withGlobalRank(tagged,
          Seq(col("__aes").desc) ++ keyCols.map(col), bucket, "rank", "__N")
        .filter(col("rank") <= n)
        .drop("__aes", "__N")
        .withColumn("rank", col("rank").cast("int"))
    }
  }

  /** Stratified A-ES: an independent weighted reservoir of `n` rows
    * per stratum. Ranking reuses the [[TopK]] bounded-heap combine
    * (k rows of state per live stratum per partition), so a
    * low-cardinality stratum column never funnels the corpus through
    * one task's sort. */
  def weightedReservoirByGroup(df: DataFrame, n: Int, weightCol: String,
                               strataCols: Seq[String], keyCols: Seq[String],
                               seed: Long): DataFrame = {
    require(n > 0, s"weightedReservoirByGroup: n must be positive, got $n")
    // Same hashKeep NULL contract as weightedReservoir: a NULL key
    // column nulls the A-ES key — drop those rows so a short stratum
    // (< n positive-weight rows) can never admit a NULL-keyed row via
    // TopK's nulls-first ranking.
    TopK.perGroup(
      df.filter(col(weightCol) > 0)
        .withColumn("__aes", aesKeyE12(seed, col(weightCol), keyCols.map(col)))
        .filter(col("__aes").isNotNull),
      strataCols, "__aes", keyCols, n, descending = true)
      .drop("__aes")
  }

  /** Group-aware k-fold (sklearn GroupKFold's leakage guarantee with
    * deterministic assignment): every row of a GROUP lands in the SAME
    * fold, so intra-group duplication can never straddle a fold
    * boundary — [[groupSplit]]'s k-fold sibling. Fold = the group's
    * seeded-md5 hash mod k + 1 (hash-balanced, not count-balanced:
    * exact balancing needs group sizes, this needs nothing — a narrow
    * per-row expression, no stats pass, no shuffle). */
  def groupKFold(df: DataFrame, groupCol: String, k: Int, seed: Long): DataFrame = {
    require(k >= 2, s"groupKFold: k >= 2, got $k")
    df.withColumn("fold",
      (conv(substring(md5(concat(col(groupCol).cast("string"),
          lit("|"), lit(seed.toString))), 1, 8), 16, 10).cast("long") % k + 1).cast("int"))
  }

  /** Leakage-safe dataset split: every row of a GROUP (domain, source,
    * near-dup cluster id, ...) lands on the SAME side, so train/eval
    * contamination through intra-group duplication is structurally
    * impossible — the row-level splits (W1/W2) cannot give this
    * guarantee. The group's md5 picks the side against cumulative
    * fraction boundaries (the house 8-hex-chars scheme — replayable as
    * a SQL CASE); a narrow per-row expression, no shuffle, no stats
    * pass, group membership never materialized. */
  def groupSplit(df: DataFrame, groupCol: String,
                 splits: Seq[(String, Double)], seed: Long): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"groupSplit: fractions must be positive and sum to 1, got $splits")
    val h = substring(
      md5(concat(col(groupCol).cast("string"), lit("|"), lit(seed.toString))), 1, 8)
    val cum = splits.scanLeft(0.0) { case (a, (_, f)) => a + f }.tail
    // boundary k as 8-hex of floor(cum_k * 2^32); string compare ==
    // unsigned numeric compare on fixed-width lowercase hex
    val bounds = cum.init.map(c => f"${math.floor(c * 4294967296.0).toLong}%08x")
    val label = bounds.zip(splits.map(_._1)).foldRight(
      lit(splits.last._1)) { case ((b, name), els) =>
      when(h < lit(b), name).otherwise(els)
    }
    df.withColumn("split", label)
  }
}
