package graft.perf

import graft.Tables
import graft.knn.{Quantize, SemDeDup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for q115: `runMain graft.perf.SemDeDupProbe <sfdir>`. */
object SemDeDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val emb = Tables.t(spark, dir, "embeddings")
    timed("read count")(println("  n = " + emb.count()))
    val codes = Quantize.int8(emb, "embedding").select(col("vec_id"), col("qvec"))
    timed("quantize count")(codes.count())
    timed("cluster iters=3")(
      SemDeDup.cluster(codes, "vec_id", 8, 3).select("vec_id", "cluster").count())
    timed("full semDedup")(
      println("  dups = " + SemDeDup.semDedup(emb, "vec_id", "embedding", 8, 3, 1225L)
        .filter(col("is_semdup") === 1).count()))
    timed("full semDedup again")(
      SemDeDup.semDedup(emb, "vec_id", "embedding", 8, 3, 1225L).count())
    spark.stop()
  }
}
