package graft.knn

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * corpus embeddings with k-means, then mark every vector that has a
  * sufficiently-cosine-similar SMALLER-id neighbor in the same cluster
  * as a semantic duplicate. The clustering bounds the quadratic
  * neighbor scope — pairs are only ever formed within a cluster, so k
  * is the scale dial: at 100 TB you pick k ~ n / targetClusterSize and
  * the per-cluster pair volume stays constant as the corpus grows.
  *
  * Everything after the int8 quantization ([[Quantize.int8]], itself
  * oracled as q81) is EXACT INTEGER arithmetic, so an independent SQL
  * engine replays the whole pipeline bit-for-bit:
  *   - centroids are integer vectors (floor of the per-dim mean);
  *   - assignment is argmin of integer squared L2, ties to the
  *     smallest centroid index;
  *   - the cosine-threshold test `cos(a,b) >= tau` is evaluated as
  *     `dot > 0 && 10000*dot^2 >= round(tau^2*10^4) * |a|^2 * |b|^2`
  *     — no float division or sqrt ever crosses engines. (Magnitudes:
  *     dot <= 127^2*dim ~ 1e6 at dim 64, so 10^4*dot^2 ~ 1e16 and
  *     tau2PerTenK*|a|^2*|b|^2 ~ 1.3e15 — both well inside Long.)
  *
  * Physical plan, per Lloyd iteration:
  *   - ASSIGN is a narrow map: the k x dim centroid table rides into
  *     every task as a literal array and a running-argmin HOF picks the
  *     cluster — no crossJoin-and-rank (which would materialize n x k
  *     rows), same shape as the IVF assignment in
  *     [[CosineKnn]] (ivfTopK).
  *   - UPDATE shuffles only the skinny (cluster, dim) partial sums:
  *     posexplode + groupBy has map-side combine, so at most
  *     k x dim x partitions rows move; the k x dim result (a few KiB)
  *     is collected to the driver to build the next literal — the
  *     classic Lloyd driver loop, bounded by k, never by n.
  * The final dup check is a cluster-keyed self-join (shuffle on the
  * cluster id, never a broadcast of the corpus) with the integer
  * cosine test inlined, then a distinct on the duplicate side.
  *
  * Reference ground: the reference's embedding tables
  * (kge/model.py, graph_embeddings/model.py) stop at nearest-neighbor
  * scoring; SemDeDup is part of the mandated LLM-pipeline surface
  * (corpus curation by embedding-space redundancy) built on the same
  * quantized-embedding substrate as q81/q85.
  */
object SemDeDup {

  /** k-means over int8 codes with integer centroids. Returns
    * (idCol, cluster) plus the carried qvec/n2 columns.
    *
    * `codes` must have `idCol` and an int-array `qvec` column of equal
    * lengths. `iters` assignment/update rounds run, then one final
    * assignment against the last centroids.
    */
  def cluster(codes: DataFrame, idCol: String, k: Int, iters: Int): DataFrame = {
    require(k > 0 && iters >= 0, "cluster: k > 0, iters >= 0")
    val cached = codes.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // deterministic init: the k smallest ids' codes, centroid index
      // = rank order (k rows to the driver — bounded by k)
      var cents: Array[Array[Long]] = cached
        .orderBy(col(idCol)).limit(k)
        .select(col("qvec")).collect()
        .map(_.getSeq[Int](0).map(_.toLong).toArray)
      for (_ <- 0 until iters) {
        val assigned = assignExpr(cached, cents)
        // skinny (cluster, dim) partial sums; k*dim rows to the driver
        val sums = assigned
          .select(col("cluster"), posexplode(col("qvec")).as(Seq("d", "q")))
          .groupBy("cluster", "d")
          .agg(sum(col("q").cast("long")).as("s"), count(lit(1)).as("n"))
          .collect()
        val next = cents.map(_.clone())
        sums.foreach { r =>
          val (c, d) = (r.getInt(0), r.getInt(1))
          // floor of the mean, exact while |sum| < 2^53; empty
          // clusters simply keep the previous centroid
          next(c)(d) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
        }
        cents = next
      }
      assignExpr(cached, cents)
    } finally cached.unpersist(blocking = false)
  }

  /** Narrow argmin assignment against a single broadcast row carrying
    * every centroid (the [[CosineKnn]] IVF idiom): the centroid table
    * arrives as DATA, not as an inlined literal, so the generated code
    * is small and IDENTICAL across Lloyd iterations — the codegen cache
    * hits instead of Janino recompiling a 512-constant method per
    * round. Ties go to the smallest centroid index: the map step
    * evaluates d2 once per centroid, the reduce keeps the first
    * minimum over the index-ascending array. */
  private def assignExpr(codes: DataFrame, cents: Array[Array[Long]]): DataFrame = {
    val spark = codes.sparkSession
    import spark.implicits._
    val centRow = cents.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("c", "v")
      .agg(sort_array(collect_list(struct(col("c"), col("v")))).as("cents"))
    // native fused argmin ([[graft.functions.KMeansAssign]]): the HOF
    // form allocates a zipped array + struct per (row, centroid) —
    // GraphProbe measured it at ~2,600 CPU-s for 100k x 400
    codes.crossJoin(broadcast(centRow))
      .withColumn("cluster",
        graft.functions.KMeansAssign(col("qvec"), col("cents")))
      .drop("cents")
  }

  /** Full SemDeDup: quantize -> cluster -> within-cluster integer
    * cosine test. Returns one row per input vector:
    * (idCol, cluster, is_semdup) where is_semdup = 1 iff a same-cluster
    * vector with a smaller id has cos >= tau (tau given as
    * round(tau^2 * 10^4) in `tau2PerTenK`). */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               k: Int = 8, iters: Int = 3, tau2PerTenK: Long = 1225): DataFrame = {
    val codes = Quantize.int8(emb, vecCol)
      .select(col(idCol), col("qvec"))
      .withColumn("n2", expr(
        "aggregate(qvec, cast(0 as bigint), (a, q) -> a + cast(q as bigint) * q)"))
    // the clustered projection feeds BOTH self-join sides and the
    // result spine — persisted so the O(n*k*dim) assignment expression
    // runs once, not three times (stays cached to back the returned
    // plan, the PageRank-dictionary discipline)
    val clustered = cluster(codes, idCol, k, iters)
      .select(col(idCol), col("qvec"), col("n2"), col("cluster"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val a = clustered.select(col(idCol).as("a_id"), col("qvec").as("aq"),
      col("n2").as("an2"), col("cluster").as("ac"))
    val b = clustered.select(col(idCol).as("b_id"), col("qvec").as("bq"),
      col("n2").as("bn2"), col("cluster").as("bc"))
    // cluster-keyed shuffle join: the quadratic scope is one cluster,
    // bounded by the k dial — never a corpus broadcast
    val dups = a.join(b, col("ac") === col("bc") && col("a_id") < col("b_id"))
      .withColumn("dot", graft.functions.ArrayDotInt(col("aq"), col("bq")))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(tau2PerTenK) * col("an2") * col("bn2"))
      .select(col("b_id").as("dup_id")).distinct()
    clustered
      .join(dups, col(idCol) === col("dup_id"), "left")
      .select(col(idCol), col("cluster"),
        when(col("dup_id").isNotNull, 1).otherwise(0).as("is_semdup"))
  }
}
