package graft.perf

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of the q116 KG PageRank at bench scale:
  * `Test/runMain graft.perf.PageRankMicro [sfDir]`. */
object PageRankMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    // mirror the q116 entry: KG triples -> (h, t) edges -> PageRank(5)
    val q116 = graft.SparkEntry.queries("q116_pagerank")
    timed("q116 cold e2e")(q116(spark, dir).count())
    timed("q116 warm e2e")(q116(spark, dir).count())
    timed("q116 warm e2e 2")(q116(spark, dir).count())
    spark.stop()
  }
}
