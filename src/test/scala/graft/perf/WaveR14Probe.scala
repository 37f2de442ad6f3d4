package graft.perf

import graft.graph.Bfs
import graft.knn.RandomProjection
import graft.text.{Dedup, Dsir}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scale probe for the q207–q212 operator wave:
  * `runMain graft.perf.WaveR14Probe [nVecs] [nDocs]`
  *
  *  - random projection of `nVecs` (default 10M) 64-dim vectors down
  *    to 16 dims — the map-only claim measured: wall should be
  *    IO/codegen-bound, no exchange (plan-asserted)
  *  - DSIR importance scores over `nDocs` (default 1M) synthetic docs
  *    (two vocabularies, 20% target) — two bucket-keyed aggregations,
  *    broadcast weight table
  *  - weighted MinHash-LSH at `nDocs`/10 docs with 1% planted
  *    repetition-heavy near-dups — recall of planted pairs printed
  *  - multi-source BFS (4 landmarks) over a 2M-edge power-law-ish
  *    graph, maxHops 8
  *
  * All inputs are deterministic id-arithmetic synthetics so the probe
  * measures the operators, not IO.
  */
object WaveR14Probe {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nDocs = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- random projection: 10M x 64d -> 16d, map-only ---
    val emb = spark.range(nVecs).select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 63), j -> cast(
        |  (cast(pmod(xxhash64(vec_id, j), 200) as int) - 100) / 100.0 as float))"""
        .stripMargin).as("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    emb.count() // materialize: time the projection, not the synthesis
    val proj = RandomProjection.projectVec(emb, dProj = 16, seed = 42L)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "random projection must stay map-only")
    timed(s"random_projection($nVecs x 64 -> 16)") {
      println(s"  checksum rows=${proj.agg(count(lit(1))).head.getLong(0)}" +
        s" sum_p0=${proj.select(sum(element_at(col("proj"), 1))).head.getLong(0)}")
    }
    emb.unpersist(blocking = false)

    // --- DSIR: 1M docs, 20% target vocabulary ---
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      when(col("id") % 5 === 0, lit("en")).otherwise(lit("xx")).as("lang"),
      expr("""concat_ws(' ', transform(sequence(0, 19), j ->
             |  concat(CASE WHEN doc_id % 5 = 0 THEN 'e' ELSE 'x' END,
             |         pmod(xxhash64(doc_id, j), 5000))))""".stripMargin).as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    docs.count()
    timed(s"dsir_scores($nDocs docs, B=4096)") {
      val sc = Dsir.importanceScores(docs, col("lang") === "en", nBuckets = 4096, seed = 42L)
      val agg = sc.agg(count(lit(1)), sum(when(col("score_e6") > 0, 1).otherwise(0))).head
      println(s"  scored=${agg.getLong(0)} positive=${agg.getLong(1)}")
    }
    docs.unpersist(blocking = false)

    // --- weighted MinHash at nDocs/10 with planted near-dups ---
    val nw = math.max(nDocs / 10, 10000L)
    // base docs: 30 tokens from a 200k-token vocab plus one token
    // repeated 10x (the weighted signal); ids in [nw, nw + nw/100)
    // duplicate doc (id - nw) exactly — 1% planted dup pairs. Vocab
    // must be corpus-realistic: a 2k vocab made every band's single
    // minhash collide corpus-wide (quadratic buckets, 80 GB shuffle —
    // the q204-advisor failure mode, reproduced and kept out of the
    // probe); 200k vocab + 2-row bands is the honest shape
    val wdocs = spark.range(nw + nw / 100).select(col("id").as("doc_id"), expr(
      s"""concat_ws(' ',
         |  concat(transform(sequence(0, 29), j ->
         |    concat('t', pmod(xxhash64(CASE WHEN doc_id >= $nw
         |      THEN doc_id - $nw ELSE doc_id END, j), 200000))),
         |  transform(sequence(0, 9), j ->
         |    concat('t', pmod(xxhash64(CASE WHEN doc_id >= $nw
         |      THEN doc_id - $nw ELSE doc_id END), 200000)))))""".stripMargin)
      .as("text"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    wdocs.count()
    timed(s"weighted_minhash(${nw + nw / 100} docs)") {
      val pairs = Dedup.weightedMinhashLsh(spark, wdocs, nBands = 8,
        threshold = 0.8, rowsPerBand = 2, cap = 8)
      val planted = pairs.filter(col("doc_b") - col("doc_a") === lit(nw)).count()
      val total = pairs.count()
      println(s"  pairs=$total planted_recalled=$planted / ${nw / 100}")
    }
    wdocs.unpersist(blocking = false)

    // --- BFS: 2M-edge graph, 4 landmarks ---
    val nEdges = 2000000L
    val edges = spark.range(nEdges).select(
      pmod(xxhash64(col("id"), lit(1)), lit(200000L)).as("s"),
      // skewed targets: low ids are hubs
      pmod(xxhash64(col("id"), lit(2)), pmod(xxhash64(col("id"), lit(3)), lit(199999L)) + 1).as("t"))
    timed(s"bfs($nEdges edges, 4 sources, maxHops=8)") {
      val d = Bfs.multiSourceHops(edges, "s", "t", Seq(0L, 1L, 2L, 3L), maxHops = 8)
      println(s"  reached=${d.count()} maxDist=${d.agg(max("dist")).head.getInt(0)}")
    }

    spark.stop()
  }
}
