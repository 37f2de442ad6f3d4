package graft.perf

/** Throwaway cold-vs-steady probe for q07's k-core loop. */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.1")
    val fn = graft.SparkEntry.queries("q07_kcore")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val n = fn(spark, dir).count()
      println(f"ROUND $round n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
