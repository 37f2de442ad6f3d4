package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines (driver mandate):
  * exact, MinHash+LSH banded, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup (the latter via [[graft.knn.CosineKnn]]).
  *
  * Portability-by-construction: every hash is md5 over an explicit
  * string, so the same pipeline is expressible in the DuckDB oracle —
  * no JVM/NumPy hash divergence. Band signatures are lexicographic
  * MINs of hex strings (min of hex == min of the 128-bit integer).
  *
  * Scale shape: shingling is a narrow map; signatures are one
  * partial-aggregated groupBy per (doc, band); the LSH join only pairs
  * documents sharing a band signature — the whole point of banding at
  * 100 TB — and exact Jaccard runs only on those candidates.
  */
object Dedup {

  /** Exact dedup: one row per distinct text with the kept (min) id. */
  def exact(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(textCol)
      .agg(min(idCol).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct word-k-gram shingles: (doc_id, s). */
  def shingles(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame = {
    val grams = (0 until k).map(j => s"element_at(w, i + $j)").mkString(", ")
    docs.select(col("doc_id"), split(lower(col(textCol)), " ").as("w"))
      .filter(size(col("w")) >= k)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(w) - ${k - 1}), i -> concat_ws(' ', $grams)))")).as("s"))
  }

  /** MinHash-banded LSH candidate pairs with exact Jaccard filter.
    * Returns (doc_a, doc_b, jaccard) for candidates >= threshold.
    *
    * Physical strategy by corpus size (same dispatch idiom as
    * [[embeddingNearDup]] and `CosineKnn.topK`):
    *
    *  - up to `fatMaxDocs` documents, ONE shuffle over the shingle
    *    stream: `collect_list(s)` rides the signature aggregation, so
    *    exact Jaccard is a per-candidate-pair `array_intersect` against
    *    the already-aggregated rows — nothing wide moves twice.
    *  - above it, the signature aggregation stays SKINNY (band minima
    *    only — fixed-width rows regardless of document size) and
    *    verification semi-joins the shingle stream down to candidate
    *    documents ONLY, so the per-row set blowup is confined to
    *    dup-suspect docs (a vanishing fraction at scale). An all-docs
    *    `collect_list` there would hold the entire corpus's shingle
    *    stream as array rows through the exchange and the cache —
    *    OOM-bait at the 100 TB design point.
    *
    * Both paths emit identical values (the band signatures and the
    * exact Jaccard re-check are shared); only the verification plumbing
    * differs.
    *
    * Lifecycle: the returned pair table comes back persisted and
    * materialized (the shingle working set is released before
    * returning); callers owning its lifecycle should unpersist it when
    * done, as q37's cluster pipeline does. Same contract for
    * [[ngramJaccard]]. */
  def minhashLsh(spark: SparkSession, docs: DataFrame, nBands: Int, shingleK: Int,
                 threshold: Double, fatMaxDocs: Long = 200000L,
                 rowsPerBand: Int = 2): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(nBands >= 1 && rowsPerBand >= 1 && nBands * rowsPerBand <= 16,
      s"nBands*rowsPerBand must be in [1,16], got $nBands*$rowsPerBand")
    // ONE md5 per shingle; minhash j is the hex string rotated left by
    // 2j chars — the standard slice-one-strong-hash trick (md5 hex chars
    // are independent uniform nibbles, so each rotation induces an
    // effectively independent ordering, and the full 128 bits survive in
    // every band: no collision-space shrink at scale). Cuts the map-side
    // hash work (nBands·rowsPerBand)× vs hashing (j|shingle) per minhash.
    //
    // Banding: each band's key is the CONCATENATION of `rowsPerBand`
    // minhashes, so an unrelated pair collides in a band with probability
    // J^rowsPerBand, not J — the classic b×r S-curve with knee at
    // (1/b)^(1/r). rowsPerBand=1 made every common low-hash shingle a
    // bucket: at sf0.1 the r=1 scheme emitted 82k candidate pairs for 256
    // true near-dups (all J ≥ 0.8), and verification dominated q16's
    // runtime (58 CPU-s). r=2 with b=8 puts the knee at ~0.35 and cuts
    // junk candidates ~J× each — recall at the J ≥ 0.5 range production
    // dedup targets stays ≥ 1-(1-J²)⁸ ≈ 0.9997 (J=0.8). Pairs with
    // threshold ≤ J < knee are best found by raising nBands, not by
    // r=1's every-shared-shingle candidacy.
    def rot(j: Int) =
      if (j == 0) col("__mh")
      else concat(substring(col("__mh"), 2 * j + 1, 32 - 2 * j),
        substring(col("__mh"), 1, 2 * j))
    val bandMins = (0 until nBands * rowsPerBand).map(j => min(rot(j)).as(s"m$j"))
    def withH(sh: DataFrame): DataFrame = sh.withColumn("__mh", md5(col("s")))
    def bandKey(b: Int) = (0 until rowsPerBand)
      .map(r => s"m${b * rowsPerBand + r}").mkString("concat(", ", ", ")")
    def bucketPairs(sig: DataFrame): DataFrame = {
      val stacked = sig.selectExpr("doc_id",
        s"stack($nBands, ${(0 until nBands).map(b => s"$b, ${bandKey(b)}").mkString(", ")}) AS (b, h)")
      stacked.as("x")
        .join(stacked.as("y"), col("x.b") === col("y.b") && col("x.h") === col("y.h")
          && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
        .distinct()
    }
    def verified(pairs: DataFrame, sets: DataFrame): DataFrame = pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sset").as("sa")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sset").as("sb")), Seq("doc_b"))
      .withColumn("ni", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("ni") * 1.0 / (size(col("sa")) + size(col("sb")) - col("ni")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // materialize the (tiny) pair table before releasing working sets —
    // iterative/bench sessions must not accumulate them.
    //
    // Persisted intermediates are materialized EAGERLY (count() right
    // after persist) because each is scanned 2-4× downstream (both sides
    // of the bucket self-join, both sides of the verification join): a
    // lazy persist lets one action schedule those scans concurrently
    // BEFORE the cache populates, recomputing the whole shingle+hash
    // aggregation per scan — measured 4-8× wall blowup at sf0.1.
    if (docs.count() <= fatMaxDocs) {
      val aggs = bandMins :+ collect_list(col("s")).as("sset")
      val sig = withH(shingles(docs, shingleK)).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
        .persist(StorageLevel.MEMORY_AND_DISK)
      sig.count()
      val out = verified(bucketPairs(sig), sig)
      out.count()
      sig.unpersist(blocking = false)
      out
    } else {
      val sh = shingles(docs, shingleK).persist(StorageLevel.MEMORY_AND_DISK)
      sh.count()
      val sig = withH(sh).groupBy("doc_id").agg(bandMins.head, bandMins.tail: _*)
      val pairs = bucketPairs(sig).persist(StorageLevel.MEMORY_AND_DISK)
      pairs.count()
      // shingle sets for candidate docs only (either side of any pair)
      val candDocs = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
      val candSets = sh.join(candDocs, Seq("doc_id"), "left_semi")
        .groupBy("doc_id").agg(collect_list(col("s")).as("sset"))
      val out = verified(pairs, candSets)
      out.count()
      sh.unpersist(blocking = false)
      pairs.unpersist(blocking = false)
      out
    }
  }

  /** 64-bit SimHash over whitespace tokens, emitted as a 64-char bit
    * string (portable; avoids signed-int hex pitfalls). Bit j of a
    * token is bit (3 - j%4) of hex digit j/4 of md5(token).
    *
    * One-pass formulation: 64 integer `sum` columns ride a single
    * partial-aggregated groupBy over the token stream, so the only
    * exchange carries |docs| rows of 64 longs — no per-bit explode ever
    * materializes (the previous (doc, pos, digit) three-stage shape
    * shuffled ~20× more rows and was the whole cost of q17/q54).
    * Integer-identical to summing ±1 per (token, bit). */
  def simhash(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // hex digits decoded once per token (16 convs), then each of the 64
    // bit sums is a shift-and-mask off its digit — contribution ±1
    val digits = (0 until 16).map(d =>
      expr(s"cast(conv(substring(h, ${d + 1}, 1), 16, 10) as int)").as(s"d$d"))
    val bitSums = (0 until 64).map { j =>
      val shift = 1 << (3 - j % 4)
      sum(expr(s"(d${j / 4} div $shift) % 2 * 2 - 1")).as(s"s$j")
    }
    val bitChars = (0 until 64).map(j => when(col(s"s$j") > 0, "1").otherwise("0"))
    docs.select(col("doc_id"), explode(split(lower(col(textCol)), " ")).as("tk"))
      .withColumn("h", md5(col("tk")))
      .select(col("doc_id") +: digits: _*)
      .groupBy("doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), concat(bitChars: _*).as("simhash"))
  }

  /** SimHash near-duplicate pairs: banded Hamming-distance join over
    * the 64-bit fingerprints of [[simhash]] — the missing half of the
    * SimHash dedup story (a fingerprint without the pairing step dedups
    * nothing). Pigeonhole banding: any pair within Hamming distance
    * `maxHamming` agrees EXACTLY on at least one of (maxHamming + 1)
    * contiguous bit bands, so candidate generation is an equi-join on
    * (band, chunk) — never an all-pairs scan — and the exact distance
    * re-check runs on candidates only. At 16-bit bands (the default
    * maxHamming = 3) random collisions are ~2⁻¹⁶ per band, so the
    * candidate set stays within a small constant factor of the true
    * near-dup set at any corpus size. Deterministic end to end (md5 bit
    * algebra, no seeds): the whole pipeline sits under the DuckDB
    * oracle, unlike the randomized LSH families.
    *
    * Returns (doc_a, doc_b, hamming) with doc_a < doc_b and
    * hamming <= maxHamming. Same lifecycle contract as [[minhashLsh]]:
    * the result comes back persisted+materialized, working sets
    * released. */
  def simhashNearDup(docs: DataFrame, maxHamming: Int = 3,
                     textCol: String = "text"): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    require(maxHamming >= 0 && maxHamming < 64,
      s"simhashNearDup: maxHamming must be in [0, 64), got $maxHamming")
    val nBands = maxHamming + 1
    // band b covers bit positions [b*64/nBands, (b+1)*64/nBands) — integer
    // division so uneven band widths distribute deterministically
    val sig = simhash(docs, textCol).persist(StorageLevel.MEMORY_AND_DISK)
    sig.count() // eager: both self-join sides scan sig before a lazy cache fills
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(expr(
        s"""transform(sequence(0, ${nBands - 1}), b -> struct(b AS b,
           |substring(simhash, (b * 64) div $nBands + 1,
           |((b + 1) * 64) div $nBands - (b * 64) div $nBands) AS chunk))""".stripMargin))
        .as("bc"))
      .select(col("doc_id"), col("simhash"), col("bc.b").as("b"), col("bc.chunk").as("chunk"))
    val out = banded.as("x")
      .join(banded.as("y"), col("x.b") === col("y.b") && col("x.chunk") === col("y.chunk")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.simhash").as("sa"), col("y.simhash").as("sb"))
      .distinct() // a pair can match in several bands
      // codegen'd byte loop (graft.functions.HammingDist) — the HOF
      // formulation allocated 2 single-char strings per bit per pair and
      // dominated this query's CPU
      .withColumn("hamming", graft.functions.HammingDist(col("sa"), col("sb")))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sig.unpersist(blocking = false)
    out
  }

  /** Exact pairwise n-gram Jaccard >= threshold (no LSH) — the
    * brute-force baseline, for bounded candidate sets. */
  def ngramJaccard(docs: DataFrame, k: Int, threshold: Double): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val sh = shingles(docs, k).persist(StorageLevel.MEMORY_AND_DISK)
    sh.count() // eager: cnt + both join sides scan sh within one action
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = sh.select(col("doc_id").as("doc_a"), col("s"))
      .join(sh.select(col("doc_id").as("doc_b"), col("s")), Seq("s"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
    val out = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    sh.unpersist(blocking = false)
    out
  }

  /** Near-duplicate CLUSTERS: connected components over the candidate
    * pair graph (GraphX Pregel kernel), keyed to the min doc id per
    * component — the canonical-document selection step of a dedup
    * pipeline. Documents in no pair form singleton clusters. */
  def clusters(spark: SparkSession, docs: DataFrame, pairs: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge, Graph}
    // Pregel pays per-partition machinery EVERY iteration (shuffle files,
    // task scheduling, vertex/edge cache scans): on a near-dup graph of
    // thousands of nodes spread over default parallelism that fixed cost
    // dwarfs the actual CC work. Gate the partition count by row count
    // per side (~1M rows/partition) — a sparse corpus (billions of docs,
    // few dup pairs) still spreads its VERTEX set over full parallelism;
    // the gate only trims the genuinely small regime.
    def gate(n: Long): Int = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, (n / 1000000L).toInt + 1))
    val edgeParts = gate(pairs.count())
    val vertexParts = gate(docs.count())
    val edgeRdd = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), ())).coalesce(edgeParts)
    val vertexRdd = docs.select(col("doc_id").cast("long"))
      .rdd.map(r => (r.getLong(0), ())).coalesce(vertexParts)
    val graph = Graph(vertexRdd, edgeRdd)
    val cc = graph.connectedComponents().vertices // (doc_id, min doc in component)
    val out = spark.createDataFrame(cc.map { case (id, comp) => (id, comp) })
      .toDF("doc_id", "cluster_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize, then release the Pregel working set
    graph.unpersist(blocking = false)
    cc.unpersist(blocking = false)
    out
  }

  /** Embedding-cosine near-dup pairs: (a_id, b_id, cos) with a < b and
    * cos >= threshold.
    *
    * Physical strategy by cardinality: up to `bruteMaxRows` the exact
    * all-pairs broadcast crossJoin runs (N² but the broadcast side is
    * small by definition); above it the LSH-bucketed path generates
    * candidates with BucketedRandomProjectionLSH on the unit sphere
    * (d² = 2−2·cos makes the Euclidean threshold a monotone transform of
    * the cosine threshold) and re-checks every candidate pair with the
    * SAME exact cosine — so emitted pairs are identical in value to the
    * brute path, and only recall is approximate (tunable via
    * `numHashTables`). The 20k default bounds the brute regime at
    * ~2×10⁸ candidate pairs — past that, quadratic row traffic beats
    * any per-pair cheapness. */
  def embeddingNearDup(emb: DataFrame, threshold: Double,
                       bruteMaxRows: Long = 20000L,
                       numHashTables: Int = 4): DataFrame = {
    if (emb.count() <= bruteMaxRows) embeddingNearDupBrute(emb, threshold)
    else embeddingNearDupLsh(emb, threshold, numHashTables)
  }

  private def embeddingNearDupBrute(emb: DataFrame, threshold: Double): DataFrame = {
    import graft.knn.CosineKnn.{dot, l2norm}
    val a = emb.select(col("id").as("a_id"), col("vec").as("av")).withColumn("an", l2norm("av"))
    val b = emb.select(col("id").as("b_id"), col("vec").as("bv")).withColumn("bn", l2norm("bv"))
    a.crossJoin(broadcast(b))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot("av", "bv") / (col("an") * col("bn")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }

  private[graft] def embeddingNearDupLsh(emb: DataFrame, threshold: Double,
                                         numHashTables: Int): DataFrame = {
    import graft.knn.CosineKnn.{dot, l2norm}
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val normed = emb.select(col("id"), col("vec"),
      array_to_vector(expr(
        "transform(vec, x -> x / sqrt(aggregate(vec, cast(0.0 as double), (a, v) -> a + v * v)))"))
        .as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(1.0).setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(normed)
    // unit-sphere distance bound equivalent to the cosine threshold
    val distThreshold = math.sqrt(math.max(0.0, 2.0 - 2.0 * threshold))
    model.approxSimilarityJoin(normed, normed, distThreshold, "dist")
      .select(col("datasetA.id").as("a_id"), col("datasetA.vec").as("av"),
        col("datasetB.id").as("b_id"), col("datasetB.vec").as("bv"))
      .filter(col("a_id") < col("b_id"))
      // exact re-check: candidate generation is approximate, the emitted
      // cosine is not
      .withColumn("an", l2norm("av")).withColumn("bn", l2norm("bv"))
      .withColumn("cos", dot("av", "bv") / (col("an") * col("bn")))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos"), 6).as("cos"))
  }
}
