package graft.perf

/** Throwaway decomposed-phase probe for Dedup.minhashLsh — wall + process
  * CPU per phase, plus formatted plans. `sbt "Test/runMain graft.perf.MinhashPhases"`.
  */
object MinhashPhases {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    import org.apache.spark.storage.StorageLevel
    import graft.text.Dedup
    import graft.text.Dedup.{MinhashA, MinhashP}
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"PHASE $label%-34s wall=${(System.nanoTime() - t0) / 1e9}%.2f s cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f s")
      r
    }
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    for (rnd <- 1 to sys.env.getOrElse("LOOP", "1").toInt) {
    println(s"== ROUND $rnd ==")
    val nBands = 16; val rowsPerBand = 1; val nHash = nBands * rowsPerBand
    val sh = Dedup.shingles(docs, 3).persist(StorageLevel.MEMORY_AND_DISK)
    t("sh.count")(sh.count())
    val withX = sh.withColumn("__x",
      expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint)"))
    val bandMins = (0 until nHash).map(j =>
      min(expr(s"(${MinhashA(j)}L * __x + ${j}L) % ${MinhashP}L")).as(s"m$j"))
    val sig = withX.groupBy("doc_id").agg(bandMins.head, bandMins.tail: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("sig.count (agg only)")(sig.count())
    val hCols = (1 to rowsPerBand).map(r => s"h$r")
    val stackArgs = (0 until nBands).map(b =>
      (s"$b" +: (0 until rowsPerBand).map(r => s"m${b * rowsPerBand + r}")).mkString(", "))
      .mkString(", ")
    val stacked = sig.selectExpr("doc_id",
      s"stack($nBands, $stackArgs) AS (b, ${hCols.mkString(", ")})")
    val pairs = stacked.as("x")
      .join(stacked.as("y"),
        ("b" +: hCols).map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _)
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("pairs")(println("pairs=" + pairs.count()))
    val candDocs = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val candSh = sh.join(candDocs, Seq("doc_id"), "left_semi")
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("candSh")(candSh.count())
    val cnt = candSh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(candSh.select(col("doc_id").as("doc_a"), col("s")), Seq("doc_a"))
      .join(candSh.select(col("doc_id").as("doc_b"), col("s")), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("ni"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("inter")(inter.count())
    val out = inter
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
      .withColumn("jaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
      .filter(col("jaccard") >= 0.2)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
    t("out")(println("out=" + out.count()))
    if (sys.env.contains("EXPLAIN")) {
      println("==== sig plan ===="); sig.explain("formatted")
      println("==== pairs plan ===="); pairs.explain("formatted")
      println("==== inter plan ===="); inter.explain("formatted")
    }
    Seq(sh, sig, pairs, candSh, inter).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
