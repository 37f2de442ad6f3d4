package graft.perf

import graft.graph.Sssp
import graft.knn.{Dbscan, Pca}
import graft.text.Chi2
import graft.util.AbTest
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale probe for the q218–q222 operator wave:
  * `runMain graft.perf.WaveR14bProbe [nVecs] [nPts] [nDocs]`
  *
  *  - Pca.gram over `nVecs` (default 2M) 64-dim vectors — the one-pass
  *    claim measured: a single aggregation whose per-partition state is
  *    one 2145-long array, so wall should track the scan, not d²
  *  - grid DBSCAN over `nPts` (default 1M) 2-D integer points (16
  *    planted blobs + uniform background) — candidate volume printed
  *    beside n so the never-all-pairs claim is a number, not a slogan
  *  - hop-bounded weighted SSSP (4 landmarks, H=8) over a 2M-edge
  *    power-law-ish graph with id-arithmetic weights
  *  - Welch t over 8 variants × `nPts` rows — one aggregation
  *  - chi2 top terms over `nDocs` (default 1M) two-vocabulary docs —
  *    planted discriminative terms must win
  *
  * All inputs are deterministic id-arithmetic synthetics so the probe
  * measures the operators, not IO.
  */
object WaveR14bProbe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nPts = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val nDocs = args.drop(2).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- Pca.gram: one pass, 2145-long state per partition ---
    val emb = spark.range(nVecs).select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 63), j -> cast(
        |  (cast(pmod(xxhash64(vec_id, j), 200) as int) - 100) / 100.0 as float))"""
        .stripMargin).as("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    emb.count()
    timed(s"pca_gram($nVecs x 64)") {
      val g = Pca.gram(emb)
      val h = g.agg(count(lit(1)), max("n"), sum("gram")).head
      println(s"  pairs=${h.getLong(0)} n=${h.getLong(1)} sum_gram=${h.getLong(2)}")
    }
    emb.unpersist(blocking = false)

    // --- DBSCAN: 16 blobs of nPts/32 each + nPts/2 uniform noise ---
    val blob = spark.range(nPts / 2).select(col("id").as("vec_id"),
      (pmod(col("id"), lit(16)) * 10000000L +
        pmod(xxhash64(col("id"), lit(1)), lit(120000)) - 60000).as("px"),
      (pmod(col("id"), lit(16)) * 10000000L +
        pmod(xxhash64(col("id"), lit(2)), lit(120000)) - 60000).as("py"))
    val noise = spark.range(nPts / 2).select((col("id") + nPts).as("vec_id"),
      pmod(xxhash64(col("id"), lit(3)), lit(160000000L)).as("px"),
      pmod(xxhash64(col("id"), lit(4)), lit(160000000L)).as("py"))
    val pts = blob.union(noise).persist(StorageLevel.MEMORY_AND_DISK)
    pts.count()
    timed(s"dbscan($nPts pts, eps=2000, minPts=8)") {
      val out = Dbscan.cluster(pts, Seq("px", "py"), eps = 2000L, minPts = 8)
      val h = out.groupBy("role").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nClusters = out.filter(col("cluster") >= 0)
        .agg(countDistinct(col("cluster"))).head.getLong(0)
      println(s"  roles=$h clusters=$nClusters (16 planted blobs)")
    }
    pts.unpersist(blocking = false)

    // --- SSSP: 2M-edge graph, 4 landmarks, H=8 ---
    val nEdges = 2000000L
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(10)), lit(200000)).as("s"),
      // power-law-ish target: half the edges land in a 2k-node core
      when(pmod(col("id"), lit(2)) === 0, pmod(xxhash64(col("id"), lit(11)), lit(2000)))
        .otherwise(pmod(xxhash64(col("id"), lit(12)), lit(200000))).as("t"),
      (pmod(xxhash64(col("id"), lit(13)), lit(20)) + 1).as("w"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    timed(s"sssp($nEdges edges, 4 landmarks, H=8)") {
      val d = Sssp.boundedDistances(edges, "s", "t", "w", Seq(0L, 1L, 2L, 3L), 8)
      val h = d.agg(count(lit(1)), max("dist")).head
      println(s"  pairs=${h.getLong(0)} max_dist=${h.getLong(1)}")
    }
    edges.unpersist(blocking = false)

    // --- Welch: 8 variants over nPts rows ---
    val ab = spark.range(nPts).select(
      concat(lit("v"), pmod(col("id"), lit(8))).as("g"),
      (pmod(xxhash64(col("id"), lit(20)), lit(10000)) + pmod(col("id"), lit(8)) * 50).as("v"))
    timed(s"welch($nPts rows, 8 variants -> 28 pairs)") {
      val w = AbTest.welch(ab, "g", "v")
      println(s"  pairs=${w.count()} sig=${w.filter(abs(col("t_e6")) > 1960000L).count()}")
    }

    // --- chi2: 1M docs, planted two-vocabulary split ---
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, lit("ca")).otherwise(lit("cb")).as("lang"),
      expr("""concat_ws(' ', transform(sequence(0, 11), j ->
             |  concat(CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END,
             |         pmod(xxhash64(doc_id, j), 2000))))""".stripMargin).as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    timed(s"chi2($nDocs docs, k=10)") {
      val top = Chi2.topTermsByClass(docs, "lang", k = 10, minDf = 100L).collect()
      val pure = top.count(r => r.getString(1).startsWith(
        if (r.getString(0) == "ca") "a" else "b"))
      println(s"  rows=${top.length} class-pure=$pure (want all)")
    }
    docs.unpersist(blocking = false)
    spark.stop()
  }
}
