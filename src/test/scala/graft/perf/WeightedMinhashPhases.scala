package graft.perf

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase timings for q210 (weightedMinhashLsh) on the sf0.1 documents:
  * `Test/runMain graft.perf.WeightedMinhashPhases [sfDir]` — which of
  * (wc build | signatures+stack | banded self-join+distinct | dense
  * verification | output materialization) owns the wall.
  */
object WeightedMinhashPhases {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cap = 8; val nBands = 16; val rowsPerBand = 1
    val wc = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w")
      .agg(least(count(lit(1)), lit(cap.toLong)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("wc build")(wc.count())
    val repl = wc.select(col("doc_id"), explode(expr(
      "transform(sequence(0, cast(c as int) - 1), r -> concat(w, '#', cast(r as string)))")).as("s"))
    val stacked = timed("signatures+stack (persist)") {
      val s = Dedup.bandBucketsFromShingles(repl, nBands, rowsPerBand)
        .persist(StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val hCols = (1 to rowsPerBand).map(r => s"h$r")
    val pairs = timed("banded self-join + distinct (persist)") {
      val p = stacked.as("x")
        .join(stacked.as("y"),
          ("b" +: hCols).map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _)
            && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
          col("x.n").as("na"), col("y.n").as("nb"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"  pairs: ${p.count()}")
      p
    }
    timed("full weightedMinhashLsh (end-to-end)") {
      println("  out rows: " + Dedup.weightedMinhashLsh(spark, docs, nBands,
        0.2, rowsPerBand, cap).count())
    }
    spark.stop()
  }
}
