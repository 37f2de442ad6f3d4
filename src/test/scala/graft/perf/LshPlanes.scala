package graft.perf

import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Scratch probe: print the BRP-LSH random unit vectors for
  * (seed 42, 4 tables, dim 64) — the q22 oracle constants. */
object LshPlanes {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(array_to_vector(expr("transform(embedding, x -> cast(x as double))")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(0.25).setNumHashTables(4)
      .setInputCol("features").setOutputCol("hashes").setSeed(42L)
    val model = lsh.fit(e)
    val m = model.getClass.getDeclaredFields.find(_.getName.contains("randMatrix")).get
    m.setAccessible(true)
    val mat = m.get(model).asInstanceOf[org.apache.spark.ml.linalg.Matrix]
    val vecs = mat.rowIter.toArray
    vecs.zipWithIndex.foreach { case (v, i) =>
      println(s"UVEC$i=[" + v.toArray.map(x => java.lang.Double.toString(x)).mkString(",") + "]")
    }
    spark.stop()
  }
}
