package graft.perf

import org.apache.spark.sql.functions._

/** Minimal repro: cost of one kill-agg over the cached ratings view,
  * across shuffle-writer / local-dir configs. Select the config with
  * `MODE` (env var or -DMODE system property), e.g. `MODE=shm,nobypass`.
  * The `shm` mode points spark.local.dir at /dev/shm/graft-tmp and
  * assumes a roomy tmpfs (≥ a few GiB at sf0.1) — a small /dev/shm
  * fails mid-run with a confusing disk-full error. */
object KCoreMicro {
  def main(args: Array[String]): Unit = {
    val mode = sys.props.getOrElse("MODE", sys.env.getOrElse("MODE", "base"))
    var b = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
    if (mode.contains("nobypass")) b = b.config("spark.shuffle.sort.bypassMergeThreshold", 1)
    if (mode.contains("shm")) b = b.config("spark.local.dir", "/dev/shm/graft-tmp")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.1")
    val r = graft.Tables.ratings(spark, dir)
    println(s"ratings rows=${r.count()} mode=$mode")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val n = r.groupBy("user_id").count().filter(col("count") < 25).count()
      println(f"kill-agg[$mode]#$i n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
