package graft.model

import org.apache.spark.sql.functions._

/** Probe for MfServing's block-shuffle branch at catalog scale
  * (r11 verdict item 1's "≥10M items" tier): 10M item factors × 64
  * users at d=16 — 5× the broadcast gate, so the glom'd
  * block-cartesian kernel is what runs; the item factor matrix
  * (~680 MB of rows) never touches the driver. Prints wall/CPU.
  * `Test/runMain graft.model.MfServingProbe [nItems] [nUsers]`. */
object MfServingProbe {
  def main(args: Array[String]): Unit = {
    val nItems = args.headOption.map(_.toLong).getOrElse(10000000L)
    val nUsers = args.lift(1).map(_.toInt).getOrElse(64)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val d = 16
    def factors(n: Long, tag: Int) = spark.range(n).select(
      col("id").cast("int").as("id"),
      expr(s"transform(sequence(1, $d), s -> " +
        s"cast(pmod(xxhash64(id, s, $tag), 1000) / 1000.0 - 0.5 as float))").as("vec"))
    val p = factors(nUsers.toLong, 1)
    val q = factors(nItems, 2)
    // 200 seen pairs so kPrime = k + maxRated stays small
    val dense = spark.range(200).select(
      pmod(col("id"), lit(nUsers.toLong)).cast("int").as("u"),
      pmod(xxhash64(col("id")), lit(nItems)).cast("int").as("i"))
    val uIdx = spark.range(nUsers.toLong).select(col("id").as("user_id"), col("id").cast("int").as("u"))
    val iIdx = spark.range(nItems).select(col("id").as("item_id"), col("id").cast("int").as("i"))
    val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
    val out = MfServing.topKRecs(spark, p, q, d, bias = false,
      dense, uIdx, iIdx, k = 5, knownItemCount = nItems)
    val n = out.count()
    println(f"block-shuffle kernel=${MfServing.lastKernel} rows=$n " +
      f"items=$nItems users=$nUsers wall=${(System.nanoTime() - t0) / 1e9}%.2f s " +
      f"cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%.2f s")
    require(MfServing.lastKernel == "block-shuffle", "wrong kernel dispatched")
    require(n == nUsers.toLong * 5, s"expected ${nUsers * 5} rows, got $n")
    spark.stop()
  }
}
