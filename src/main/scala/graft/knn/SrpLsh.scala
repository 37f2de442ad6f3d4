package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sign-random-projection (SRP) LSH over int8-quantized vectors — the
  * ANN path built for independent verification: every step is integer
  * arithmetic (quantized codes × integer plane weights → sign bits →
  * bucket ids), so a SQL oracle replays the index EXACTLY, where
  * MLlib's `BucketedRandomProjectionLSH` (CosineKnn.approxTopK) draws
  * its hyperplanes from an unreplayable JVM RNG and can only be pinned
  * by a golden.
  *
  * Index: `NTables` hash tables × `NBits` sign bits. Plane weights are
  * a pure function of the flat index (Knuth multiplicative hash mod 15,
  * shifted to [-7, 7]) — no RNG state, no stored model. Candidates =
  * pairs sharing any (table, bucket); exact cosine re-rank on the
  * original doubles. SRP preserves cosine by design (P[bit differs] =
  * angle/π), so Hamming-equal buckets concentrate high-cosine pairs.
  *
  * Scale shape: planes are NTables·NBits·dim rows (a broadcast); code explosion
  * is dim rows per vector, partial-aggregated to NTables·NBits partials
  * per vector BEFORE the exchange (map-side combine), so wire volume is
  * 64 small rows per vector; the candidate join shuffles both sides by
  * (table, bucket) — co-located, never all-pairs; re-rank touches only
  * candidates. Bucket skew (a dense region) is the classic LSH hot key;
  * AQE skew-split handles it, and more tables/bits trade recall for
  * smaller buckets. */
object SrpLsh {

  val NTables = 4
  val NBits = 8

  /** Integer plane weight for flat index ((t·NBits + b)·dim + d):
    * Knuth multiplicative hash (2654435761 = ⌊2³²/φ⌋) mod 15 − 7. */
  def planeWeight(idx: Long): Int =
    (((idx * 2654435761L) % 4294967296L) % 15 - 7).toInt

  /** (t, b, d, w) plane table, generated distributed — never a literal
    * blob in the plan. */
  private def planes(spark: org.apache.spark.sql.SparkSession, dim: Int): DataFrame =
    spark.range(NTables.toLong * NBits * dim).select(
      expr(s"cast(id div ${NBits * dim} as int)").as("t"),
      expr(s"cast((id div $dim) % $NBits as int)").as("b"),
      expr(s"cast(id % $dim as int)").as("d"),
      expr("cast((id * 2654435761) % 4294967296 % 15 - 7 as int)").as("w"))

  /** Bucket ids per (vector, table): quantize to int8 codes, explode,
    * join the broadcast planes, two partial-aggregated groupBys. */
  private[graft] def buckets(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val codes = Quantize.int8(df.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol), posexplode(col("qvec")).as(Seq("d", "q")))
    codes.join(broadcast(planes(spark, dim)), "d")
      .groupBy(col(idCol), col("t"), col("b"))
      .agg(sum(col("w") * col("q")).as("s"))
      .groupBy(col(idCol), col("t"))
      .agg(sum(when(col("s") > 0, expr("shiftleft(1, b)")).otherwise(0)).as("bucket"))
  }

  /** Top-k by exact cosine among SRP candidates. queries/items:
    * (id, vec: array<double>), all of length `dim`. Output
    * (query_id, item_id, rank, score); like every ANN here it may
    * return < k rows per query — the index is a candidate filter, not
    * a completeness guarantee. */
  def srpTopK(queries: DataFrame, items: DataFrame, dim: Int, k: Int,
              excludeSelf: Boolean = false): DataFrame = {
    require(k > 0, s"srpTopK: k must be positive, got $k")
    val qb = buckets(queries, "id", "vec", dim).withColumnRenamed("id", "query_id")
    val ib = buckets(items, "id", "vec", dim).withColumnRenamed("id", "item_id")
    val cand = qb.join(ib, Seq("t", "bucket"))
      .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
      .select("query_id", "item_id").distinct()
    val qv = queries.select(col("id").as("query_id"), col("vec").as("qv"))
    val iv = items.select(col("id").as("item_id"), col("vec").as("iv"))
    cand.join(qv, "query_id").join(iv, "item_id")
      .withColumn("score",
        graft.functions.ArrayDot(col("qv"), col("iv")) /
          (sqrt(graft.functions.ArrayDot(col("qv"), col("qv"))) *
            sqrt(graft.functions.ArrayDot(col("iv"), col("iv")))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("item_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "rank", "score")
  }
}
