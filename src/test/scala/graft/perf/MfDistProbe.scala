package graft.perf

import org.apache.spark.sql.functions._

/** Measured evidence for the MF distributed tiers (the r11 verdict's
  * item 8): 10M synthetic interactions over 3M users × 1M items at
  * d=16 — 65M params for BPR (64M for ALS/HKV), ABOVE the 50M
  * fitEmb dispatch threshold, so the genuine fitDistributed epoch
  * loop (gather joins + per-partition combined gradients/normal
  * equations + localCheckpoint discipline) is what runs. Prints
  * per-model wall/CPU for README. Not part of the default suite; run
  * with `Test/runMain graft.perf.MfDistProbe [all|bpr|als|hkv] [epochs] [nRows]`. */
object MfDistProbe {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val nRows = args.lift(2).map(_.toLong).getOrElse(10000000L)
    val epochs = args.lift(1).map(_.toInt).getOrElse(2)
    def want(m: String) = which == "all" || which == m
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val nU = 3000000; val nI = 1000000; val d = 16
    val data = spark.range(nRows).select(
      pmod(xxhash64(col("id"), lit(1)), lit(nU.toLong)).cast("int").as("u"),
      pmod(xxhash64(col("id"), lit(2)), lit(nI.toLong)).cast("int").as("i"),
      (pmod(xxhash64(col("id"), lit(3)), lit(5)) + 1).cast("double").as("r"))
      .persist()
    println(s"rows=${data.count()} users=$nU items=$nI d=$d epochs=$epochs " +
      s"bprParams=${nU.toLong * d + nI.toLong * (d + 1)} alsParams=${(nU.toLong + nI) * d}")
    def run(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      body
      println(f"$tag%-14s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s " +
        f"cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
    }
    if (want("bpr")) run("bpr-dist") {
      val (p, q) = new graft.model.BprMf(d, epochs, 0.05, 0.01, 42L)
        .fitEmb(spark, data.select("u", "i"), nU, nI) // 65M params > 50M gate
      println(s"  bpr factors: p=${p.count()} q=${q.count()}")
    }
    if (want("als")) run("als-dist") {
      val (p, q) = new graft.model.Als(d, epochs, 0.1, 42L)
        .fitEmb(spark, data, nU, nI) // 64M params > 50M gate
      println(s"  als factors: p=${p.count()} q=${q.count()}")
    }
    if (want("hkv")) run("hkv-dist") {
      val (p, q) = new graft.model.AlsImplicit(d, epochs, 0.1, 40.0, 42L)
        .fitEmb(spark, data, nU, nI)
      println(s"  hkv factors: p=${p.count()} q=${q.count()}")
    }
    spark.stop()
  }
}
