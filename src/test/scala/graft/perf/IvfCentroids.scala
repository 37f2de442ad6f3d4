package graft.perf

import org.apache.spark.sql.functions._

/** Scratch probe for the q52 oracle conversion: run ivfTopK exactly as
  * q52 does, dump its output AND the fitted centroids, so the DuckDB
  * replay can be validated against a self-consistent pair. */
object IvfCentroids {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id").as("id"),
        expr("transform(embedding, x -> cast(x as double))").as("vec"))
    val out = graft.knn.CosineKnn.ivfTopK(e.filter(col("id") < 50), e, 5,
      nProbe = 16, excludeSelf = true)
      .select("query_id", "item_id", "rank")
    out.coalesce(1).write.mode("overwrite").parquet("/tmp/q52probe_out")
    graft.knn.CosineKnn.lastIvfCentroidsTl.get().foreach { case (i, c) =>
      println(s"CENT$i=[" + c.map(java.lang.Double.toString).mkString(",") + "]")
    }
    spark.stop()
  }
}
