package graft.perf

import org.apache.spark.sql.functions._

/** Scale CURVES (1×/4×/16×) for the five most expensive bench
  * queries' kernels (r12 verdict #3) — single-size probes can hide a
  * superlinear plan hazard (the coreness persist-vs-checkpoint
  * regression was exactly that shape); a 3-point curve makes growth
  * visible. Each kernel runs a small warmup first (codegen compile
  * out of the measurement), then the three tiers; the probe prints
  * wall ratios and flags any 4× step whose wall grows more than
  * 4 × 1.6 (linear × generous log/variance factor).
  * Run: `sbt "Test/runMain graft.perf.ScaleCurveProbe"`. */
object ScaleCurveProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val out = body
      ((System.nanoTime() - t0) / 1e9, out)
    }
    var failures = List.empty[String]
    val only = sys.env.get("CURVES").map(_.split(',').toSet)
    def curve(name: String, sizes: Seq[Long])(run: Long => Long): Unit = {
      if (!only.forall(_.contains(name))) return
      run(sizes.head / 4 max 1000L) // warmup at 0.25x
      val walls = sizes.map { n =>
        val (w, out) = timed(run(n))
        println(f"$name%-18s n=$n%,12d out=$out%,12d wall=$w%7.2fs")
        w
      }
      walls.sliding(2).zip(sizes.sliding(2)).foreach { case (Seq(a, b), Seq(n1, n2)) =>
        val ratio = b / a
        val sizeRatio = n2.toDouble / n1
        val bound = sizeRatio * 1.6
        val verdict = if (ratio <= bound) "ok" else "SUPERLINEAR"
        println(f"$name%-18s ${n1}%,d -> ${n2}%,d: wall x$ratio%.2f (bound x$bound%.1f) $verdict")
        if (ratio > bound) failures ::= s"$name $n1->$n2 x$ratio"
      }
    }

    def edges(nEdges: Long, nNodes: Long) = spark.range(nEdges).select(
      pmod(xxhash64(col("id")), lit(nNodes)).as("u"),
      pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("v"))

    // ---- q116 PageRank (5 rounds; skinny rank exchange per round)
    curve("pagerank", Seq(500000L, 2000000L, 8000000L)) { e =>
      graft.graph.PageRank.run(edges(e, e / 5), "u", "v", iters = 5).count()
    }

    // ---- q126 LPA (4 synchronous rounds, min_by argmax)
    curve("lpa", Seq(500000L, 2000000L, 8000000L)) { e =>
      graft.graph.LabelPropagation.run(edges(e, e / 5), "u", "v", iters = 4).count()
    }

    // ---- q145 coreness (h-index fixpoint, 20 rounds)
    curve("coreness", Seq(250000L, 1000000L, 4000000L)) { e =>
      graft.graph.Coreness.run(edges(e, e / 5), "u", "v", iters = 20).count()
    }

    // ---- q142 k-fold + itemKNN + one-pass metrics chain
    curve("kfold_knn_eval", Seq(100000L, 400000L, 1600000L)) { n =>
      val nUsers = n / 100; val nItems = 2000L
      val ratings = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(nUsers)).cast("string").as("user_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(nItems)).cast("string").as("item_id"),
        (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 1).cast("double").as("rating"))
        .groupBy("user_id", "item_id").agg(max("rating").as("rating"))
      val folded = graft.split.EdgeSplits.kFold(ratings, 5, "user", Seq(col("item_id")))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val train = folded.filter(col("fold") =!= 1).select("user_id", "item_id", "rating")
      val test = folded.filter(col("fold") === 1).select("user_id", "item_id", "rating")
      val recs = graft.model.ItemKnn.recs(train, minRating = 4.0, cap = 50,
        minCooc = 2, kNbrs = 10, kRecs = 5)
      val out = graft.eval.Metrics.perUserAtK(
        recs.select("user_id", "item_id", "rank"), test, 5, 4.0).count()
      folded.unpersist(blocking = false)
      out
    }

    // ---- q108 six-stage corpus pipeline (curation -> line dedup ->
    //      LSH canonical -> token budget -> pack -> shard)
    curve("pipeline_e2e", Seq(50000L, 200000L, 800000L)) { nDocs =>
      // vocabulary must PASS the curation gate: 8 unambiguous English
      // stopwords (lang-id + stopword-ratio bits) and 7-8 char words
      // (mean word length inside [3, 10]); 64 symbols keep the dedup
      // joins honest like CorpusProbe's corpus
      val vocab = (Seq("the", "of", "and", "that", "with", "this",
        "from", "have") ++ (0 until 56).map(i => s"planet$i")).mkString(" ")
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        lit("en").as("lang"),
        concat(lit("s"), pmod(col("id"), lit(4))).as("source"),
        array_join(expr(
          s"""transform(sequence(0, 39),
             |  i -> element_at(split('$vocab', ' '),
             |         cast(pmod(xxhash64(id, i), 64) as int) + 1))""".stripMargin), " ")
          .as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val kept = docs.join(graft.text.TextOps.curationKept(docs).select("doc_id"),
        Seq("doc_id"), "left_semi")
      val rewritten = graft.text.LineDedup.dedupCorpus(kept, 3)
        .filter(col("n_kept") > 0)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          translate(col("text"), "\n", " ").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val pairs = graft.text.Dedup.minhashLsh(spark, rewritten, 8, 3, 0.8)
      val cc = graft.text.Dedup.clusters(spark, rewritten, pairs)
      pairs.unpersist(blocking = false)
      val canon = graft.text.Dedup.canonical(rewritten, cc)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val scored = canon.select(col("doc_id"), col("source"),
        graft.text.TextOps.qualityScore(col("text")).as("quality"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val selected = graft.prep.TokenBudget.select(scored, nDocs / 4)
      val packIn = canon.join(selected.select("doc_id"), Seq("doc_id"), "left_semi")
      val packed = graft.prep.SequencePack.pack(packIn, 512, groupWidth = 256L)
      val out = packed.count() +
        graft.util.Sampling.shard(selected.select("doc_id"), nShards = 4,
          seed = 5L, keyCols = Seq("doc_id")).count()
      Seq(docs, rewritten, canon).foreach(_.unpersist(blocking = false))
      out
    }

    if (failures.nonEmpty) {
      println(s"SUPERLINEAR growth detected: ${failures.mkString("; ")}")
      sys.exit(1)
    }
    println("all scale curves within linear x 1.6 per 4x step")
    spark.stop()
  }
}
