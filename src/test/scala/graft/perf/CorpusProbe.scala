package graft.perf

import org.apache.spark.sql.functions._

/** Scale probe for the late-r9 corpus operators (line dedup, span-dup
  * stats, BPE encode, curation gate, LSH anchor pairs, LWW compaction)
  * at 1M hash-generated docs (override with N_DOCS) — an order of
  * magnitude past the sf0.1 test tables, with a BOUNDED 64-word
  * vocabulary so dedup collisions actually occur (pure-hex corpora
  * have none and flatter the dedup joins).
  * Run: `sbt "Test/runMain graft.perf.CorpusProbe"`. */
object CorpusProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(name: String, rows: Long)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$name%-22s rows=$rows%,d out=$out%,d wall=$wall%.2fs cpu=$cpu%.1fs throughput=${rows / wall / 1e6}%.2fM rows/s")
    }

    val nDocs = sys.env.getOrElse("N_DOCS", "1000000").toLong
    // 40 words per doc from a 64-word vocabulary (the sf tables' shape,
    // 200x the row count): plenty of cross-doc line/shingle collisions
    val vocab = (0 until 64).map(i => s"w$i").mkString(" ")
    val docs = spark.range(nDocs).select(col("id").as("doc_id"), lit("en").as("lang"),
      array_join(expr(
        s"""transform(sequence(0, 39),
           |  i -> element_at(split('$vocab', ' '),
           |         cast(pmod(xxhash64(id, i), 64) as int) + 1))""".stripMargin), " ")
        .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"docs materialized: ${docs.count()}")

    timed("lineDedup(3)", nDocs) {
      graft.text.LineDedup.dedupCorpus(docs, 3)
        .agg(sum("n_kept")).collect().head.getLong(0)
    }
    timed("dupSpanStats(5)", nDocs) {
      graft.text.Dedup.dupSpanStats(docs, 5)
        .agg(sum("n_dup_spans")).collect().head.getLong(0)
    }
    timed("bpeEncode(8)", nDocs) {
      graft.text.Bpe.encode(docs, Seq(("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
        ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u")))
        .agg(sum("n_tokens")).collect().head.getLong(0)
    }
    // replace-chain depth vs merge count: encode cost is one chained
    // codegen'd replace per merge, so 32 merges probes 4x the expression
    // depth of the row above on the same corpus (the merges compose —
    // ("w","3") feeds ("w3","1") — like a real learned table would)
    val merges32 = (0 to 9).map(d => ("w", d.toString)) ++
      (for (a <- 0 to 5; b <- 0 to 9) yield (s"w$a", b.toString)).take(22)
    timed("bpeEncode(32)", nDocs) {
      graft.text.Bpe.encode(docs, merges32)
        .agg(sum("n_tokens")).collect().head.getLong(0)
    }
    // post-r10-fix token budget: ~20 sources over the whole corpus (the
    // 100 TB shape that killed the naive per-source window). Q_POINTS
    // sets quality cardinality: the default 1e6 is the UNsaturated
    // worst case (level-1 skinny table still growing with the corpus);
    // real corpora sit in the saturated mass-point regime (qualityScore
    // is a round-6 ratio that piles up on few values — Q_POINTS=1000),
    // where level 1 is corpus-size-independent and the doc-group split
    // carries the load. Budget admits a ~5% sliver per source.
    val qPoints = sys.env.getOrElse("Q_POINTS", "1000000").toLong
    timed(s"tokenBudget(20src,q=$qPoints)", nDocs) {
      val scored = docs.select(col("doc_id"),
        pmod(xxhash64(col("doc_id")), lit(20)).cast("string").as("source"),
        (pmod(xxhash64(col("doc_id"), lit(7)), lit(qPoints)) / qPoints.toDouble).as("quality"),
        lit(40L).as("n_tokens"))
      graft.prep.TokenBudget.select(scored, nDocs * 40 / 20 / 20).count()
    }
    timed("curationGate", nDocs) {
      graft.text.TextOps.curationGate(docs)
        .agg(sum(when(col("keep"), 1L).otherwise(0L))).collect().head.getLong(0)
    }
    // the filter-consumer form MUST go through curationKept: a plain
    // .filter(col("keep")) re-evaluates every pushed-down signal subtree
    // (79.4 s for this corpus; see the curationKept scaladoc)
    timed("curationKept", nDocs) {
      graft.text.TextOps.curationKept(docs).count()
    }
    timed("lshAnchorPairs(4x2)", nDocs) {
      graft.text.Dedup.lshAnchorPairs(docs, 4, 3, 2).count()
    }
    val updates = docs.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), col("lang"), upper(col("text")).as("text"))
    timed("compact(base+10%)", nDocs) {
      graft.util.Upsert.compact(
        Seq(docs.withColumn("version", lit(0)), updates.withColumn("version", lit(1))),
        "doc_id", Seq("version")).count()
    }

    docs.unpersist()

    // q108's COMPOSED pipeline at probe scale: gate → line dedup →
    // LSH canonicalization → token budget → packing → shard manifest.
    // Needs its own corpus: the bounded-hex vocab above fails the
    // curation gate wholesale (no stopwords -> lang mismatch), so this
    // one mixes the gate's English stopword list into a 64-word vocab
    // (~16% stopword mass, ~5.3 avg chars — inside every gate band).
    val pvocab = ("the a of and to in is that it for".split(' ') ++
      (0 until 54).map(i => s"word$i")).mkString(" ")
    val pdocs = spark.range(nDocs).select(col("id").as("doc_id"), lit("en").as("lang"),
      pmod(xxhash64(col("id"), lit(99)), lit(20)).cast("string").as("source"),
      array_join(expr(
        s"""transform(sequence(0, 39),
           |  i -> element_at(split('$pvocab', ' '),
           |         cast(pmod(xxhash64(id, i), 64) as int) + 1))""".stripMargin), " ")
        .as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"pipeline docs materialized: ${pdocs.count()} " +
      s"(gate keeps ${graft.text.TextOps.curationKept(pdocs).count()})")
    timed("pipelineE2E(q108)", nDocs) {
      val kept = pdocs.join(
        graft.text.TextOps.curationKept(pdocs).select("doc_id"), Seq("doc_id"), "left_semi")
      val rewritten = graft.text.LineDedup.dedupCorpus(kept, 3)
        .filter(col("n_kept") > 0)
        .join(pdocs.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"), translate(col("text"), "\n", " ").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = graft.text.Dedup.minhashLsh(spark, rewritten, 8, 3, 0.8)
      val cc = graft.text.Dedup.clusters(spark, rewritten, pairs)
      pairs.unpersist(blocking = false)
      val canon = graft.text.Dedup.canonical(rewritten, cc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val scored = canon.select(col("doc_id"), col("source"),
        graft.text.TextOps.qualityScore(col("text")).as("quality"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      // per-source corpus mass is ~2*nDocs tokens; admit a ~25% sliver
      val selected = graft.prep.TokenBudget.select(scored, nDocs / 2)
      val packIn = canon.join(selected.select("doc_id"), Seq("doc_id"), "left_semi")
      val packed = graft.prep.SequencePack.pack(packIn, 512, groupWidth = 256L)
      val sharded = graft.util.Sampling.shard(
        selected.select("doc_id"), nShards = 4, seed = 5L, keyCols = Seq("doc_id"))
      val out = packed.join(sharded.select("doc_id", "shard"), Seq("doc_id"))
        .groupBy("shard").agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
        .agg(sum("n_docs")).collect().head.getLong(0)
      rewritten.unpersist(blocking = false)
      canon.unpersist(blocking = false)
      out
    }
    pdocs.unpersist()

    // q102's decode path: REAL ImageIO PNG decode + 8x8 NN downsample
    // per row. Images are tiny (16x16, ~100 B) so this times codec
    // overhead per row, the dominant term for thumbnail-scale dedup;
    // default 200k rows (override N_IMGS)
    import graft.multimodal.MultimodalOps
    import spark.implicits._
    val nImgs = sys.env.getOrElse("N_IMGS", "200000").toLong
    val media = spark.range(nImgs).as[Long].mapPartitions(_.map(i =>
        MultimodalOps.Media(i, "image", MultimodalOps.syntheticPng(i, 16, 16), 16, 16, 0)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"pngs materialized: ${media.count()}")
    timed("aHash64(16x16 png)", nImgs) {
      MultimodalOps.perceptualHashes(media).filter(col("phash").isNotNull).count()
    }
    media.unpersist()
    spark.stop()
  }
}
