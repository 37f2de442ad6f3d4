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
    spark.stop()
  }
}
