package graft.perf

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Throwaway perf probe for the q22 LSH ANN path. */
object AnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var stageMs = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
        stageMs += ms
        if (ms > 300)
          println(f"    stage ${si.stageId}%3d ${si.name.takeWhile(_ != '\n').take(55)}%-57s wall=$ms%6d ms tasks=${si.numTasks}")
      }
    })
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.001")
    import org.apache.spark.metrics.source.CodegenMetrics
    def compileMs = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); stageMs = 0; val c0 = compileMs
      val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s (stages: ${stageMs / 1000.0}%.2f s, janino: ${(compileMs - c0) / 1000.0}%.2f s)")
      r
    }
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
    t("warm count")(e.count())
    t("q22 run 1")(graft.knn.CosineKnn.approxTopK(e.filter(col("id") < 50), e, 5, excludeSelf = true)
      .select("query_id", "item_id", "rank").count())
    t("q22 run 2")(graft.knn.CosineKnn.approxTopK(e.filter(col("id") < 50), e, 5, excludeSelf = true)
      .select("query_id", "item_id", "rank").count())
    spark.stop()
  }
}
