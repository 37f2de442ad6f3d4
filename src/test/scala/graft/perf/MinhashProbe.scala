package graft.perf

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway perf probe — run with `sbt "Test/runMain graft.perf.MinhashProbe"`.
  * Times each internal stage of Dedup.minhashLsh at sf0.001 and prints
  * per-Spark-stage wall/task breakdowns.
  */
object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        println(f"    stage ${si.stageId}%3d ${si.name.takeWhile(_ != '\n').take(60)}%-62s wall=${ms.getOrElse(-1L)}%6d ms tasks=${si.numTasks}")
      }
    })
    import org.apache.spark.sql.functions._
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.001")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("docs.count")(docs.count())
    val sh = graft.text.Dedup.shingles(docs, 3)
    t("shingles.count")(sh.count())
    t("shingles.count AGAIN")(sh.count())
    val withH = sh.withColumn("__mh", md5(col("s")))
    val nBands = 8
    def rot(b: Int) =
      if (b == 0) col("__mh")
      else concat(substring(col("__mh"), 2 * b + 1, 32 - 2 * b),
        substring(col("__mh"), 1, 2 * b))
    val bandMins = (0 until nBands).map(b => min(rot(b)).as(s"h$b"))
    val aggs = bandMins :+ collect_list(col("s")).as("sset")
    val sig = withH.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("sig.count (agg+collect)")(sig.count())
    val stacked = sig.selectExpr("doc_id",
      s"stack($nBands, ${(0 until nBands).map(b => s"$b, h$b").mkString(", ")}) AS (b, h)")
    val pairs = stacked.as("x")
      .join(stacked.as("y"), col("x.b") === col("y.b") && col("x.h") === col("y.h")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    t("bucketPairs.count")(println("pairs=" + pairs.count()))
    t("bucketPairs.count AGAIN")(pairs.count())
    spark.stop()
  }
}
