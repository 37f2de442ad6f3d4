package graft.perf

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway perf probe — run with `sbt "Test/runMain graft.perf.MinhashProbe"`.
  * Times Dedup.minhashLsh end-to-end (the SHIPPED kernel, both the q16
  * r=1 and the q37 r=2 parameterizations) and prints per-Spark-stage
  * wall/task breakdowns, so probe numbers always reflect what production
  * executes.
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
    val q16 = t("minhashLsh b=16 r=1 thr=0.2") {
      graft.text.Dedup.minhashLsh(spark, docs, 16, 3, 0.2, rowsPerBand = 1)
    }
    println("q16-shape pairs=" + q16.count())
    q16.unpersist(blocking = false)
    val q37 = t("minhashLsh b=8 r=2 thr=0.8") {
      graft.text.Dedup.minhashLsh(spark, docs, 8, 3, 0.8)
    }
    println("q37-shape pairs=" + q37.count())
    q37.unpersist(blocking = false)
    spark.stop()
  }
}
