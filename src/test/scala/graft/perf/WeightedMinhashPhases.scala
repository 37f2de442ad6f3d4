package graft.perf

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase timings for q210 (weightedMinhashLsh) on the sf0.1 documents:
  * `Test/runMain graft.perf.WeightedMinhashPhases [sfDir]` — which of
  * (wc build | signatures+stack | banded self-join+distinct | dense
  * verification | output materialization) owns the wall, and the AQE
  * coalesce-before-exploding-join A/B (event-log r14: the stream side
  * of the banded self-join coalesced to ONE 3.1 MiB partition, then
  * the join exploded 65M rows inside that single task — 33 s serial).
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
      println(f"$label%-50s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
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
    def selfJoin(lhs: org.apache.spark.sql.DataFrame) = lhs.as("x")
      .join(stacked.as("y"),
        ("b" +: hCols).map(c => col(s"x.$c") === col(s"y.$c")).reduce(_ && _)
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
    timed("self-join+distinct, stream side AS-IS (count)") {
      println("  pairs: " + selfJoin(stacked).count())
    }
    val par = spark.sparkContext.defaultParallelism
    val pairs = timed("self-join+distinct, stream repartitioned (persist)") {
      val p = selfJoin(stacked.repartition(par, ("b" +: hCols).map(col): _*))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println("  pairs: " + p.count()); p
    }
    val vocabArr = wc.select("w").distinct().orderBy("w").collect().map(_.getString(0))
    import spark.implicits._
    val vIdx = vocabArr.zipWithIndex.toSeq.toDF("w", "__vi")
    val nLongs = (vocabArr.length + 15) / 16
    val packCols = (0 until nLongs).map(l =>
      sum(when(expr("__vi div 16") === l,
        expr("shiftleft(c, cast((__vi % 16) * 4 as int))"))
        .otherwise(0L)).as(s"v$l"))
    val vecs = wc.join(broadcast(vIdx), Seq("w"))
      .groupBy("doc_id").agg(packCols.head, packCols.tail: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    timed("vecs build")(vecs.count())
    def side(idCol: String, pre: String) =
      vecs.select((col("doc_id").as(idCol) +:
        (0 until nLongs).map(l => col(s"v$l").as(s"$pre$l"))): _*)
    val niExpr = (0 until nLongs).flatMap(l => (0 until 16).map(k =>
      s"least((a$l >> ${4 * k}) & 15L, (b$l >> ${4 * k}) & 15L)"))
      .mkString(" + ")
    val verified = pairs
      .join(side("doc_a", "a"), Seq("doc_a"))
      .join(side("doc_b", "b"), Seq("doc_b"))
      .withColumn("ni", expr(niExpr))
      .withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
      .filter(col("wjaccard") >= 0.2)
      .select(col("doc_a"), col("doc_b"), round(col("wjaccard"), 6).as("wjaccard"))
    timed("verify from persisted pairs (noop count)") {
      println("  out rows: " + verified.count())
    }
    timed("verify + localCheckpoint(true)") {
      verified.localCheckpoint(true)
    }
    timed("full weightedMinhashLsh (end-to-end, fresh)") {
      println("  out rows: " + Dedup.weightedMinhashLsh(spark, docs, nBands,
        0.2, rowsPerBand, cap).count())
    }
    spark.stop()
  }
}
