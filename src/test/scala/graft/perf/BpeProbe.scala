package graft.perf

import graft.text.Bpe
import org.apache.spark.sql.SparkSession

/** Prints the merges Bpe.train learns on a testdata dir (used to pin
  * q96's fixed merge table) and times train/encode past test scale.
  * Run: sbt 'Test/runMain graft.perf.BpeProbe /root/testdata/sf0.01 8' */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val merges = Bpe.train(docs, n)
    println(f"train($n) in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    println("merges: " + merges.map { case (a, b) => s"""("$a", "$b")""" }.mkString(", "))
    val t1 = System.nanoTime()
    val enc = Bpe.encode(docs, merges)
    val total = enc.agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0)
    println(f"encode in ${(System.nanoTime() - t1) / 1e9}%.2f s, total tokens $total")
    spark.stop()
  }
}
