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

  /** int8 code of one vector — the same arithmetic as
    * [[Quantize.int8]]'s expressions (max-abs scale; HALF_UP round via
    * BigDecimal.valueOf, which is what Spark's `round` does on doubles;
    * clamp to ±127), so kernel and relational quantization produce
    * identical integers. */
  private def quantizeLocal(v: Array[Double]): Array[Int] = {
    var mx = 0.0
    var i = 0
    while (i < v.length) { val a = math.abs(v(i)); if (a > mx) mx = a; i += 1 }
    val scale = mx / 127
    val q = new Array[Int](v.length)
    if (scale != 0) {
      i = 0
      while (i < v.length) {
        val r = BigDecimal.valueOf(v(i) / scale)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toInt
        q(i) = math.max(-127, math.min(127, r))
        i += 1
      }
    }
    q
  }

  /** Bucket ids per (vector, table) — fused per-partition kernel: the
    * plane weights are a pure function of the index, so each task
    * tabulates them once and runs the NTables·NBits integer dots in a
    * tight loop (no broadcast, no explode). The relational form of the
    * same math — explode codes, join a generated plane table, two
    * partial-aggregated groupBys — is what the q85 oracle replays in
    * SQL; the spec pins this kernel to a pure-Scala replay of that
    * exact integer chain, so the two formulations cannot drift. */
  private[graft] def buckets(df: DataFrame, idCol: String, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .as[(Long, Seq[Double])]
      .mapPartitions { it =>
        val w = Array.tabulate(NTables * NBits * dim)(i => planeWeight(i.toLong))
        it.flatMap { case (id, vec) =>
          val q = quantizeLocal(vec.toArray)
          (0 until NTables).iterator.map { t =>
            var bucket = 0L
            var b = 0
            while (b < NBits) {
              var s = 0L
              var d = 0
              val off = (t * NBits + b) * dim
              while (d < dim) { s += w(off + d).toLong * q(d); d += 1 }
              if (s > 0) bucket |= 1L << b
              b += 1
            }
            (id, t, bucket)
          }
        }
      }
      .toDF(idCol, "t", "bucket")
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
