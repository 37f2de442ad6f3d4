package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of the r15 WordShingles kernel vs the pre-r15 composable form
  * on the sf0.1 documents corpus (same md5 minhash downstream so the
  * comparison includes the hash floor).
  * `Test/runMain graft.perf.ShingleMicro [sfDir]` */
object ShingleMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"  $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%6.1f"); r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
    def refShingles(k: Int) = {
      val grams = (0 until k).map(j => s"element_at(w, i + $j)").mkString(", ")
      docs.select(col("doc_id"), split(lower(col("text")), " ").as("w"))
        .filter(size(col("w")) >= k)
        .select(col("doc_id"), explode(expr(
          s"array_distinct(transform(sequence(1, size(w) - ${k - 1}), i -> concat_ws(' ', $grams)))")).as("s"))
    }
    def newShingles(k: Int) = graft.text.Dedup.shingles(docs, k)
    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // alternate, 3 rounds each, so JIT/host drift hits both
    for (round <- 1 to 3) {
      timed(s"old shingles k=3 noop (r$round)")(sink(refShingles(3)))
      timed(s"new shingles k=3 noop (r$round)")(sink(newShingles(3)))
      timed(s"old + md5+conv fold (r$round)")(sink(
        refShingles(3).select(expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint)").as("x"))))
      timed(s"new + md5+conv fold (r$round)")(sink(
        newShingles(3).select(expr("cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint)").as("x"))))
    }
    spark.stop()
  }
}
