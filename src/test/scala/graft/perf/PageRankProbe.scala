package graft.perf

import graft.Tables
import graft.graph.{KGraph, PageRank}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase timing for q116 at an arbitrary sf dir:
  * `runMain graft.perf.PageRankProbe /root/testdata/sf0.1`. */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def tri: DataFrame = {
      val r = Tables.ratings(spark, dir)
      val userProps = Tables.t(spark, dir, "customer")
        .join(r.select(col("user_id").as("c_custkey")), Seq("c_custkey"), "left_semi")
      val itemProps = Tables.t(spark, dir, "part")
        .join(r.select(col("item_id").as("p_partkey")), Seq("p_partkey"), "left_semi")
      KGraph.allTriples(r, Seq(
        KGraph.propertyTriples(userProps, "c_custkey", isUser = true, "c_mktsegment", "mktsegment"),
        KGraph.propertyTriples(itemProps, "p_partkey", isUser = false, "p_brand", "brand")))
    }
    timed("triples count")(println("  edges = " + tri.count()))
    for (it <- Seq(1, 5)) {
      timed(s"pagerank iters=$it")(
        println("  rows = " + PageRank.run(tri, "head", "tail", it).count()))
    }
    spark.stop()
  }
}
