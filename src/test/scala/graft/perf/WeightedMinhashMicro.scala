package graft.perf

import graft.text.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Micro-decomposition of the q210 verification stage: which operator
  * owns the 18 s over 12.3M persisted candidate pairs.
  * `Test/runMain graft.perf.WeightedMinhashMicro [sfDir]` */
object WeightedMinhashMicro {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val cap = 8
    val wc = docs.select(col("doc_id"),
        explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("doc_id", "w")
      .agg(least(count(lit(1)), lit(cap.toLong)).as("c"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    wc.count()
    val repl = wc.select(col("doc_id"), explode(expr(
      "transform(sequence(0, cast(c as int) - 1), r -> concat(w, '#', cast(r as string)))")).as("s"))
    val stacked = Dedup.bandBucketsFromShingles(repl, 16, 1)
      .persist(StorageLevel.MEMORY_AND_DISK)
    stacked.count()
    val pairs = stacked.as("x")
      .join(stacked.as("y"), col("x.b") === col("y.b") && col("x.h1") === col("y.h1")
        && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    println("pairs: " + pairs.count())
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
    vecs.count()
    def side(idCol: String, pre: String) =
      vecs.select((col("doc_id").as(idCol) +:
        (0 until nLongs).map(l => col(s"v$l").as(s"$pre$l"))): _*)
    val niExpr = (0 until nLongs).flatMap(l => (0 until 16).map(k =>
      s"least((a$l >> ${4 * k}) & 15L, (b$l >> ${4 * k}) & 15L)"))
      .mkString(" + ")
    // warm everything once
    timed("A1 scan pairs only: agg(sum na)") {
      pairs.agg(sum("na")).collect()
    }
    timed("A2 scan pairs only again") {
      pairs.agg(sum("na")).collect()
    }
    val j1 = pairs.join(broadcast(side("doc_a", "a")), Seq("doc_a"))
    timed("B join #1 (broadcast vecs): agg(sum a0)") {
      j1.agg(sum(expr("a0 & 15L"))).collect()
    }
    val j2 = j1.join(broadcast(side("doc_b", "b")), Seq("doc_b"))
    timed("C join #2: agg(sum b0)") {
      j2.agg(sum(expr("b0 & 15L"))).collect()
    }
    timed("D + niExpr: agg(sum ni)") {
      j2.withColumn("ni", expr(niExpr)).agg(sum("ni")).collect()
    }
    timed("E0 + integer filter ni>=15: count") {
      j2.withColumn("ni", expr(niExpr)).filter(col("ni") >= 15).count()
    }
    timed("E1 + integer threshold 5*ni >= na+nb-ni: count") {
      j2.withColumn("ni", expr(niExpr))
        .filter(col("ni") * 5L >= col("na") + col("nb") - col("ni")).count()
    }
    timed("E2 + double div filter (again)") {
      j2.withColumn("ni", expr(niExpr))
        .withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
        .filter(col("wjaccard") >= 0.2).count()
    }
    timed("E + wjaccard filter: count") {
      j2.withColumn("ni", expr(niExpr))
        .withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
        .filter(col("wjaccard") >= 0.2).count()
    }
    timed("F + round project: noop-ish agg") {
      j2.withColumn("ni", expr(niExpr))
        .withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
        .filter(col("wjaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("wjaccard"), 6).as("wjaccard"))
        .agg(sum("wjaccard")).collect()
    }
    timed("E3 single-copy integer form 6*ni >= na+nb: count") {
      j2.withColumn("ni", expr(niExpr))
        .filter(col("ni") * 6L >= col("na") + col("nb")).count()
    }
    timed("G2 checkpoint-barrier then filter+round+checkpoint") {
      val nit = j2.withColumn("ni", expr(niExpr))
        .select("doc_a", "doc_b", "na", "nb", "ni")
        .localCheckpoint(true)
      nit.withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
        .filter(col("wjaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("wjaccard"), 6).as("wjaccard"))
        .localCheckpoint(true)
    }
    timed("G full verify + localCheckpoint(true)") {
      j2.withColumn("ni", expr(niExpr))
        .withColumn("wjaccard", col("ni") * 1.0 / (col("na") + col("nb") - col("ni")))
        .filter(col("wjaccard") >= 0.2)
        .select(col("doc_a"), col("doc_b"), round(col("wjaccard"), 6).as("wjaccard"))
        .localCheckpoint(true)
    }
    spark.stop()
  }
}
