package graft.perf

import graft.text.EntityResolution
import graft.text.EntityResolution._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of q200/q202's scoring chain at sf0.1.
  * `Test/runMain graft.perf.ErMicro [sfDir]` */
object ErMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val p = spark.read.parquet(s"$dir/part.parquet")
    val l = p.select(col("p_partkey").as("left_id"), col("p_name").as("l_name"),
      col("p_brand").as("l_brand"), col("p_size").as("l_size"))
    val r = p.select((col("p_partkey") + lit(1000000L)).as("right_id"),
      regexp_replace(col("p_name"), " [^ ]+$", "").as("r_name"),
      col("p_brand").as("r_brand"), col("p_size").as("r_size"))
    val keys = Seq(
      (compositeKey(element_at(split(col("l_name"), " "), 1), col("l_brand")),
        compositeKey(element_at(split(col("r_name"), " "), 1), col("r_brand"))),
      (compositeKey(col("l_brand"), col("l_size")),
        compositeKey(col("r_brand"), col("r_size"))))
    val fields = Seq(
      Field("name", "l_name", "r_name", TokenJaccardSim, 3L),
      Field("brand", "l_brand", "r_brand", ExactSim, 1L),
      Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L))
    val cand = candidates(l, r, "left_id", "right_id", keys)
    timed("A candidates distinct count (2.3M)")(println("  " + cand.count()))
    timed("A2 again")(cand.count())
    val scored = scoredPairs(l, r, "left_id", "right_id", keys, fields, 3000L)
    timed("B scored count")(println("  " + scored.count()))
    timed("B2 scored count again")(scored.count())
    timed("C scored distinct select count") {
      println("  " + scored.select("left_id", "right_id", "score").distinct().count())
    }
    spark.stop()
  }
}
