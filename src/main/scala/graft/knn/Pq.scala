package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Product quantization (Jégou, Douze & Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") — the 100-TB serving
  * compression standard past int8: the d-dim embedding splits into
  * `m` subspaces, each sub-vector is replaced by the index of its
  * nearest codebook centroid, so a vector stores in `m` small codes
  * (m·log2(ksub) bits — 16–32× under float32 at production settings)
  * and queries score items through an m·ksub ADC lookup table without
  * ever touching the original vectors.
  *
  * House style ([[SemDeDup]]/[[Quantize]]): everything after the int8
  * quantization is EXACT INTEGER arithmetic, so DuckDB replays
  * codebooks, codes, and ADC scores bit-for-bit —
  *   - codebooks come from per-subspace Lloyd rounds with integer
  *     (floor-of-mean) centroids, argmin ties to the smallest centroid
  *     index (the [[SemDeDup.cluster]] recipe with a `sub` key);
  *   - ADC score = Σ_sub dot(query_sub, centroid[sub][code]) — a sum
  *     of int8×centroid products, |each| ≤ 127²·d, exact in Long;
  *   - the cosine-style rank divides by √(query n2 · reconstruction
  *     n2), pure-IEEE double ops both engines round identically
  *     (the q183 precedent).
  *
  * Physical plan: training shuffles only skinny (sub, code, dim)
  * partial sums (map-side combined, ≤ m·ksub·dsub rows to the driver
  * per Lloyd round — bounded by the codebook, never the corpus);
  * encoding is a narrow broadcast-join + fused argmin per subspace;
  * serving joins the item codes against a BROADCAST lookup table of
  * nQueries·m·ksub partial dots and map-side-combines the per-item
  * sum — the corpus never shuffles and the original embedding column
  * is never read at query time.
  */
object Pq {

  /** Int8-quantized sub-vectors: one row per (id, subspace).
    * `emb` must carry `idCol` and a numeric-array `vecCol` whose
    * length is divisible by `m` (checked per row by slice bounds). */
  def int8Sub(emb: DataFrame, idCol: String, vecCol: String, m: Int): DataFrame =
    Quantize.int8(emb, vecCol)
      .select(col(idCol).as("id"), col("qvec"))
      .withColumn("dsub", (size(col("qvec")) / m).cast("int"))
      .select(col("id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
        col("qvec"), col("dsub"))
      .select(col("id"), col("sub"),
        expr("slice(qvec, sub * dsub + 1, dsub)").as("sqv"))

  /** Per-subspace integer k-means: `iters` Lloyd rounds over the
    * sub-vector table. Deterministic init: subspace s's codebook
    * starts from the `ksub` smallest ids' sub-vectors (code = id rank).
    * Empty codes keep their previous centroid. Returns
    * cents(sub)(code) = centroid Long vector. */
  def train(sv: DataFrame, m: Int, ksub: Int, iters: Int): Array[Array[Array[Long]]] = {
    require(m > 0 && ksub > 0 && iters >= 0, "pq: m, ksub > 0, iters >= 0")
    val cached = sv.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var cents: Array[Array[Array[Long]]] = {
        val init = cached
          .withColumn("rn", row_number().over(
            Window.partitionBy("sub").orderBy(col("id"))))
          .filter(col("rn") <= ksub)
          .select(col("sub"), (col("rn") - 1).as("c"), col("sqv"))
          .collect()
        val a = Array.ofDim[Array[Long]](m, ksub)
        init.foreach(r => a(r.getInt(0))(r.getInt(1)) =
          r.getSeq[Int](2).map(_.toLong).toArray)
        require(a.forall(_.forall(_ != null)),
          s"pq: need >= $ksub vectors to seed every subspace codebook")
        a
      }
      for (_ <- 0 until iters) {
        // skinny (sub, code, dim) partial sums; m*ksub*dsub driver rows
        val sums = assign(cached, cents)
          .select(col("sub"), col("code"), posexplode(col("sqv")).as(Seq("d", "q")))
          .groupBy("sub", "code", "d")
          .agg(sum(col("q").cast("long")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.map(_.clone()))
        sums.foreach { r =>
          next(r.getInt(0))(r.getInt(1))(r.getInt(2)) =
            math.floor(r.getLong(3).toDouble / r.getLong(4)).toLong
        }
        cents = next
      }
      cents
    } finally cached.unpersist(blocking = false)
  }

  /** [[train]] on a SAMPLE — the production-scale codebook recipe
    * (the [[graft.text.Bpe.trainSampled]] precedent): full-corpus
    * Lloyd is the measured wall dominator of end-to-end ANN at 1M
    * vectors (PqProbe — most of the 110 s flat PQ-ADC is training),
    * yet codebooks are statistics of the vector DISTRIBUTION, which a
    * bounded sample pins. Draws a uniform A-ES reservoir of
    * `sampleIds` vector ids ([[graft.util.Sampling.weightedReservoir]]
    * at weight 1 — deterministic in (id, seed), so the sampled
    * codebook is a pure function of the input set) and runs the
    * UNCHANGED Lloyd kernel on that slice; assignment/serving stay
    * full-corpus. With `sampleIds` ≥ the distinct id count the sample
    * IS the corpus and the result equals [[train]] exactly
    * (spec-pinned in PqSpec). */
  def trainSampled(sv: DataFrame, m: Int, ksub: Int, iters: Int,
                   sampleIds: Long, seed: Long): Array[Array[Array[Long]]] = {
    require(sampleIds >= ksub,
      s"pq trainSampled: sampleIds >= ksub needed to seed codebooks, got $sampleIds < $ksub")
    val keep = graft.util.Sampling.weightedReservoir(
        sv.select("id").distinct().withColumn("__w", lit(1.0)),
        sampleIds, "__w", Seq("id"), seed)
      .select("id")
    train(sv.join(keep, Seq("id"), "left_semi"), m, ksub, iters)
  }

  /** Dispatch: `trainSampleIds` = 0 trains on the full corpus
    * ([[train]]); > 0 trains on a bounded sample ([[trainSampled]]). */
  private def trainDispatch(sv: DataFrame, m: Int, ksub: Int, iters: Int,
                            trainSampleIds: Long, seed: Long): Array[Array[Array[Long]]] =
    if (trainSampleIds <= 0L) train(sv, m, ksub, iters)
    else trainSampled(sv, m, ksub, iters, trainSampleIds, seed)

  /** Codebook as a small DataFrame: (sub, c, v array<long>, n2). */
  def codebookDf(sv: DataFrame, cents: Array[Array[Array[Long]]]): DataFrame = {
    val spark = sv.sparkSession
    import spark.implicits._
    cents.zipWithIndex.flatMap { case (cb, s) =>
      cb.zipWithIndex.map { case (v, c) =>
        (s, c, v.toSeq, v.map(x => x * x).sum) }
    }.toSeq.toDF("sub", "c", "v", "n2")
  }

  /** Adds `code` = argmin_c ‖sqv − cents(sub)(c)‖² (ties to the
    * smallest code) — narrow fused argmin against one broadcast row
    * per subspace, the [[SemDeDup]] assignment idiom. */
  def assign(sv: DataFrame, cents: Array[Array[Array[Long]]]): DataFrame = {
    val spark = sv.sparkSession
    import spark.implicits._
    val centRows = cents.zipWithIndex.map { case (cb, s) =>
      (s, cb.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq)
    }.toSeq.toDF("sub", "cents")
    sv.join(broadcast(centRows), Seq("sub"))
      .withColumn("code",
        graft.functions.KMeansAssign(col("sqv"), col("cents")))
      .drop("cents")
  }

  /** IVF-ADC top-k (the q190 surface): the faiss-style serving
    * composition for catalogs where even m-byte codes are too many to
    * scan per query — a COARSE integer-k-means quantizer (kc lists,
    * trained with [[train]] at m = 1) restricts each query to its
    * `nProbe` nearest lists, and only those candidates are scored by
    * the [[adcTopK]] PQ lookup sums. At cluster scale the coarse list
    * id is the partition key: a query touches nProbe partitions, the
    * rest of the catalog is never read.
    *
    * This is the residual-free IVFADC variant (PQ codes encode the raw
    * vector, not the residual v − c): one shared codebook, simpler
    * exact-integer replay; residual encoding is the known next
    * fidelity step and would add a per-(list, sub, code) cross-term
    * table, still integer. Scoring, tie-breaks, sentinels and the
    * output shape are exactly [[adcTopK]]'s — the two differ only in
    * WHICH items are scored, which is the point. */
  def ivfAdcTopK(emb: DataFrame, idCol: String, vecCol: String,
                 queryPred: org.apache.spark.sql.Column,
                 kc: Int, nProbe: Int, m: Int, ksub: Int, iters: Int,
                 k: Int, excludeSelf: Boolean = true,
                 trainSampleIds: Long = 0L, trainSeed: Long = 42L): DataFrame = {
    require(k >= 1 && nProbe >= 1 && nProbe <= kc, "pq ivfAdcTopK: bad k/nProbe")
    val codes8 = Quantize.int8(emb, vecCol)
      .select(col(idCol).as("id"), col("qvec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // the sub-vector projection backs BOTH training loops and the
    // returned lazy plan; released with codes8 once the caller's
    // action has run (train() forces its own actions while persisted)
    val sv = codes8
      .withColumn("dsub", (size(col("qvec")) / m).cast("int"))
      .select(col("id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
        col("qvec"), col("dsub"))
      .select(col("id"), col("sub"),
        expr("slice(qvec, sub * dsub + 1, dsub)").as("sqv"))
    try {
      // coarse quantizer: the SAME Lloyd kernel at m = 1 over the full
      // code vector — one list id per item
      val svFull = codes8.select(col("id"), lit(0).as("sub"), col("qvec").as("sqv"))
      val cCents = trainDispatch(svFull, 1, kc, iters, trainSampleIds, trainSeed)
      val lists = assign(svFull, cCents).select(col("id"), col("code").as("ccode"))
      val cents = trainDispatch(sv, m, ksub, iters, trainSampleIds, trainSeed)
      val cb = codebookDf(sv, cents)
      val codes = assign(sv, cents).select(col("id"), col("sub"), col("code"))
      val itemN2 = codes.join(broadcast(cb.select(col("sub"),
          col("c").as("code"), col("n2"))), Seq("sub", "code"))
        .groupBy("id").agg(sum("n2").as("xn2"))
      // query probes: nProbe nearest coarse centroids by integer L2,
      // ties to the smaller list id — kc rows broadcast per query
      val spark = emb.sparkSession
      import spark.implicits._
      val cCentDf = cCents(0).zipWithIndex
        .map { case (v, c) => (c, v.toSeq) }.toSeq.toDF("ccode", "cv")
      val qFull = svFull.filter(queryPred)
      val probes = qFull.join(broadcast(cCentDf))
        .select(col("id").as("query_id"), col("ccode"),
          expr("aggregate(zip_with(sqv, cv, (x, y) -> (cast(x as bigint) - y) * (cast(x as bigint) - y)), 0L, (a, e) -> a + e)")
            .as("d2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("d2"), col("ccode"))))
        .filter(col("rn") <= nProbe)
        .select("query_id", "ccode")
      // candidates: items whose list was probed (each item in exactly
      // one list — no dedup needed)
      val cands = lists.join(broadcast(probes), Seq("ccode"))
        .select(col("query_id"), col("id").as("item_id"))
      val qsv = sv.filter(queryPred)
      val qn2 = qsv
        .select(col("id"), expr(
          "aggregate(sqv, 0L, (a, x) -> a + cast(x as bigint) * cast(x as bigint))").as("p"))
        .groupBy("id").agg(sum("p").as("qn2"))
      val lut = qsv.join(broadcast(cb), Seq("sub"))
        .select(col("id").as("query_id"), col("sub"), col("c"),
          expr("aggregate(zip_with(sqv, v, (x, y) -> cast(x as bigint) * y), 0L, (a, e) -> a + e)")
            .as("pdot"))
      val adc = cands
        .join(codes.withColumnRenamed("id", "item_id"), Seq("item_id"))
        .join(broadcast(lut), Seq("query_id", "sub"))
        .filter(col("code") === col("c"))
        .groupBy(col("query_id"), col("item_id"))
        .agg(sum("pdot").as("adc"))
      adc
        .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
        .join(broadcast(qn2.withColumnRenamed("id", "query_id")), Seq("query_id"))
        .join(itemN2.withColumnRenamed("id", "item_id"), Seq("item_id"))
        .withColumn("score",
          when(col("qn2") === 0L || col("xn2") === 0L, lit(-2.0))
            .otherwise(col("adc").cast("double") /
              (sqrt(col("qn2").cast("double")) * sqrt(col("xn2").cast("double")))))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("item_id"), col("adc"), col("rank"),
          round(col("score"), 6).as("score_r"))
    } finally codes8.unpersist(blocking = false)
  }

  /** RESIDUAL IVF-PQ top-k (the q192 surface) — faiss `IVFPQ` proper:
    * like [[ivfAdcTopK]] but the product codebooks encode the RESIDUAL
    * `v − c(list)` instead of the raw vector, which is the recall
    * lever (residuals are centered near zero, so the same ksub
    * centroids resolve much finer structure than on raw vectors).
    *
    * Exact-integer scoring decomposition, per candidate x in list ℓ
    * with residual codes x₁..x_m:
    *   adc  = dot(q, c_ℓ) + Σ_s dot(q_s, rcent[s][x_s])
    *   ‖x̂‖² = ‖c_ℓ‖² + 2·Σ_s dot(c_ℓ,s, rcent[s][x_s]) + Σ_s ‖rcent[s][x_s]‖²
    * The cross terms dot(c_ℓ,s, rcent[s][x_s]) form a kc·m·ksub
    * literal table built driver-side from the two (driver-resident,
    * KiB-sized) codebooks — every term a Long, so the DuckDB replay is
    * exact. Score/rank/sentinel contract is [[adcTopK]]'s. */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
                queryPred: org.apache.spark.sql.Column,
                kc: Int, nProbe: Int, m: Int, ksub: Int, iters: Int,
                k: Int, excludeSelf: Boolean = true,
                trainSampleIds: Long = 0L, trainSeed: Long = 42L): DataFrame = {
    require(k >= 1 && nProbe >= 1 && nProbe <= kc, "pq ivfPqTopK: bad k/nProbe")
    val spark = emb.sparkSession
    import spark.implicits._
    val codes8 = Quantize.int8(emb, vecCol)
      .select(col(idCol).as("id"), col("qvec"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val svFull = codes8.select(col("id"), lit(0).as("sub"), col("qvec").as("sqv"))
      val cCents = trainDispatch(svFull, 1, kc, iters, trainSampleIds, trainSeed)
      val cCentDf = cCents(0).zipWithIndex
        .map { case (v, c) => (c, v.toSeq, v.map(x => x * x).sum) }
        .toSeq.toDF("ccode", "cv", "cn2")
      val lists = assign(svFull, cCents)
        .select(col("id"), col("code").as("ccode"))
      // residual sub-vectors: (v − c_list) sliced into m subspaces;
      // values stay small ints (|q| ≤ 127, |cent| ≤ 127 → |r| ≤ 254)
      val rsv = codes8.join(lists, Seq("id"))
        .join(broadcast(cCentDf.select(col("ccode"), col("cv"))), Seq("ccode"))
        .withColumn("rvec", expr(
          "zip_with(qvec, cv, (x, y) -> cast(x as int) - cast(y as int))"))
        .withColumn("dsub", (size(col("rvec")) / m).cast("int"))
        .select(col("id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
          col("rvec"), col("dsub"))
        .select(col("id"), col("sub"),
          expr("slice(rvec, sub * dsub + 1, dsub)").as("sqv"))
      val rCents = trainDispatch(rsv, m, ksub, iters, trainSampleIds, trainSeed)
      val rcb = codebookDf(rsv, rCents)
      val codes = assign(rsv, rCents).select(col("id"), col("sub"), col("code"))
      // cross table: dot(c_list sub-slice, residual centroid) — built
      // driver-side from the two codebooks (kc·m·ksub Long rows)
      val dsub = cCents(0)(0).length / m
      val cross = (for {
        cc <- 0 until kc; s <- 0 until m; rc <- 0 until ksub
      } yield {
        val cSlice = cCents(0)(cc).slice(s * dsub, (s + 1) * dsub)
        val rv = rCents(s)(rc)
        (cc, s, rc, cSlice.zip(rv).map { case (a, b) => a * b }.sum)
      }).toDF("ccode", "sub", "code", "xdot")
      // item reconstruction norm: cn2 + 2·Σ cross + Σ ‖rcent‖²
      val itemN2 = codes.join(lists, Seq("id"))
        .join(broadcast(cross), Seq("ccode", "sub", "code"))
        .join(broadcast(rcb.select(col("sub"), col("c").as("code"), col("n2"))),
          Seq("sub", "code"))
        .groupBy("id", "ccode")
        .agg((sum(col("n2")) + lit(2L) * sum(col("xdot"))).as("rpart"))
        .join(broadcast(cCentDf.select(col("ccode"), col("cn2"))), Seq("ccode"))
        .select(col("id"), (col("cn2") + col("rpart")).as("xn2"))
      // query side: probes by integer L2 to coarse centroids, plus
      // (a) dot(q, c_ℓ) per probed list and (b) the residual-codebook LUT
      val qFull = svFull.filter(queryPred)
      val qProbe = qFull.join(broadcast(cCentDf))
        .select(col("id").as("query_id"), col("ccode"),
          expr("aggregate(zip_with(sqv, cv, (x, y) -> (cast(x as bigint) - y) * (cast(x as bigint) - y)), 0L, (a, e) -> a + e)")
            .as("d2"),
          expr("aggregate(zip_with(sqv, cv, (x, y) -> cast(x as bigint) * y), 0L, (a, e) -> a + e)")
            .as("qcdot"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("query_id").orderBy(col("d2"), col("ccode"))))
        .filter(col("rn") <= nProbe)
        .select("query_id", "ccode", "qcdot")
      val qsv = codes8.filter(queryPred)
        .withColumn("dsub", (size(col("qvec")) / m).cast("int"))
        .select(col("id"), explode(expr(s"sequence(0, ${m - 1})")).as("sub"),
          col("qvec"), col("dsub"))
        .select(col("id"), col("sub"),
          expr("slice(qvec, sub * dsub + 1, dsub)").as("sqv"))
      val qn2 = qsv
        .select(col("id"), expr(
          "aggregate(sqv, 0L, (a, x) -> a + cast(x as bigint) * cast(x as bigint))").as("p"))
        .groupBy("id").agg(sum("p").as("qn2"))
      val lut = qsv.join(broadcast(rcb), Seq("sub"))
        .select(col("id").as("query_id"), col("sub"), col("c"),
          expr("aggregate(zip_with(sqv, v, (x, y) -> cast(x as bigint) * y), 0L, (a, e) -> a + e)")
            .as("pdot"))
      // candidates carry their list's dot(q, c) once; residual LUT sums
      // ride the same grouped aggregation
      val cands = lists.join(broadcast(qProbe), Seq("ccode"))
        .select(col("query_id"), col("id").as("item_id"), col("qcdot"))
      val adc = cands
        .join(codes.withColumnRenamed("id", "item_id"), Seq("item_id"))
        .join(broadcast(lut), Seq("query_id", "sub"))
        .filter(col("code") === col("c"))
        .groupBy(col("query_id"), col("item_id"))
        .agg((first(col("qcdot")) + sum(col("pdot"))).as("adc"))
      adc
        .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
        .join(broadcast(qn2.withColumnRenamed("id", "query_id")), Seq("query_id"))
        .join(itemN2.withColumnRenamed("id", "item_id"), Seq("item_id"))
        .withColumn("score",
          when(col("qn2") === 0L || col("xn2") <= 0L, lit(-2.0))
            .otherwise(col("adc").cast("double") /
              (sqrt(col("qn2").cast("double")) * sqrt(col("xn2").cast("double")))))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("item_id"), col("adc"), col("rank"),
          round(col("score"), 6).as("score_r"))
    } finally codes8.unpersist(blocking = false)
  }

  /** Train + encode + ADC top-k in one call (the q188 surface):
    * queries are the `emb` rows satisfying `queryPred`; every row is
    * an indexable item. Score is the asymmetric quantized cosine —
    * ADC dot over the item's RECONSTRUCTION, divided by the exact
    * int8 query norm and the reconstruction norm; zero norms score
    * the −2 sentinel ([[Quantize.cosTopK]] convention). Returns
    * (query_id, item_id, adc, rank, score_r) with rank by
    * (score desc, item_id) and score_r = round(score, 6). */
  def adcTopK(emb: DataFrame, idCol: String, vecCol: String,
              queryPred: org.apache.spark.sql.Column,
              m: Int, ksub: Int, iters: Int, k: Int,
              excludeSelf: Boolean = true,
              trainSampleIds: Long = 0L, trainSeed: Long = 42L): DataFrame = {
    require(k >= 1, "pq adcTopK: k >= 1")
    val sv = int8Sub(emb, idCol, vecCol, m)
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val cents = trainDispatch(sv, m, ksub, iters, trainSampleIds, trainSeed)
      val cb = codebookDf(sv, cents)
      val codes = assign(sv, cents).select(col("id"), col("sub"), col("code"))
      // item reconstruction norm: Σ_sub ‖centroid[sub][code]‖²
      val itemN2 = codes.join(broadcast(cb.select(col("sub"),
          col("c").as("code"), col("n2"))), Seq("sub", "code"))
        .groupBy("id").agg(sum("n2").as("xn2"))
      // query-side: exact int8 norms + the nQ·m·ksub partial-dot LUT
      val qsv = sv.filter(queryPred)
      val qn2 = qsv
        .select(col("id"), expr(
          "aggregate(sqv, 0L, (a, x) -> a + cast(x as bigint) * cast(x as bigint))").as("p"))
        .groupBy("id").agg(sum("p").as("qn2"))
      val lut = qsv.join(broadcast(cb), Seq("sub"))
        .select(col("id").as("query_id"), col("sub"), col("c"),
          expr("aggregate(zip_with(sqv, v, (x, y) -> cast(x as bigint) * y), 0L, (a, e) -> a + e)")
            .as("pdot"))
      // ADC: one broadcast-LUT join + map-side-combined per-item sum
      val adc = codes
        .join(broadcast(lut), codes("sub") === lut("sub") && codes("code") === lut("c"))
        .groupBy(col("query_id"), codes("id").as("item_id"))
        .agg(sum("pdot").as("adc"))
      adc
        .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
        .join(broadcast(qn2.withColumnRenamed("id", "query_id")), Seq("query_id"))
        .join(itemN2.withColumnRenamed("id", "item_id"), Seq("item_id"))
        .withColumn("score",
          when(col("qn2") === 0L || col("xn2") === 0L, lit(-2.0))
            .otherwise(col("adc").cast("double") /
              (sqrt(col("qn2").cast("double")) * sqrt(col("xn2").cast("double")))))
        .withColumn("rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
        .filter(col("rank") <= k)
        .select(col("query_id"), col("item_id"), col("adc"), col("rank"),
          round(col("score"), 6).as("score_r"))
    } finally sv.unpersist(blocking = false)
  }
}
