package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric per-vector int8 embedding quantization + quantized-cosine
  * serving — the standard 4× memory cut for broadcast/ANN serving
  * tiers (a 10M × 64-dim float table is 2.6 GB; int8 is 640 MB and
  * SIMD-dots faster).
  *
  * Quantization: `q_i = round(x_i / (max|x| / 127))` clamped to
  * [−127, 127] (symmetric, zero-preserving). The per-vector scale
  * CANCELS in cosine — `qcos = q·p / (√(q·q)·√(p·p))` needs no scales
  * at all — so quantized scoring is a pure function of EXACT INTEGER
  * dot products: every elementwise product ≤ 127² and a 64-dim sum
  * stays far inside double's 53-bit exact-integer range, which makes
  * the whole pipeline order-independent and oracle-replayable (stock
  * int8 serving is neither).
  */
object Quantize {

  /** (id, scale, qvec: array<tinyint>) — scale = max|x|/127 (1.0 for
    * the zero vector, whose qvec is all zeros). */
  def int8(emb: DataFrame, idCol: String = "id", vecCol: String = "vec"): DataFrame =
    emb
      .withColumn("__mx", expr(s"aggregate($vecCol, 0.0d, (a, x) -> greatest(a, abs(x)))"))
      .withColumn("scale",
        when(col("__mx") === 0.0, lit(1.0)).otherwise(col("__mx") / 127.0))
      .select(col(idCol), col("scale"),
        expr(s"transform($vecCol, x -> cast(least(greatest(round(x / scale), -127.0d), 127.0d) as tinyint))")
          .as("qvec"))

  /** Exact top-k by QUANTIZED cosine: integer dots, rank by
    * (qcos desc, item id). Zero vectors score the −2 sentinel, exactly
    * like [[CosineKnn]]'s kernels. Physical shape is the relational
    * broadcast form — quantized serving exists to make the broadcast
    * side small; at catalog scale compose with the ANN family instead. */
  def cosTopK(queries: DataFrame, items: DataFrame, k: Int,
              excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, "quantized topK: k >= 1")
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as bigint) * cast(y as bigint)), 0L, (acc, v) -> acc + v)")
    val q = int8(queries).select(col("id").as("query_id"), col("qvec").as("qq"))
      .withColumn("qaa", dot("qq", "qq"))
    val it = int8(items).select(col("id").as("item_id"), col("qvec").as("iq"))
      .withColumn("ibb", dot("iq", "iq"))
    q.crossJoin(broadcast(it))
      .filter(if (excludeSelf) col("query_id") =!= col("item_id") else lit(true))
      .withColumn("qcos",
        when(col("qaa") === 0L || col("ibb") === 0L, lit(-2.0))
          .otherwise(dot("qq", "iq").cast("double") /
            (sqrt(col("qaa").cast("double")) * sqrt(col("ibb").cast("double")))))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("qcos").desc, col("item_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "item_id", "qcos", "rank")
  }
}
