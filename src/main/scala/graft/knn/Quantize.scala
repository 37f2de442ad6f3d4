package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization — the storage/serving form of
  * an embedding table (4× smaller than float32, 8× than float64; the
  * dequantized vector is what an int8 ANN index actually searches).
  * Per vector: scale = max|x| / 127, q_i = round(x_i / scale) clamped
  * to [-127, 127], reconstruction x̂_i = q_i · scale.
  *
  * All math is per-row array expressions (`transform`/`aggregate`
  * inside codegen) — a narrow map over the embedding table, no shuffle,
  * no UDF; at 100 TB the quantizer streams through the scan. Zero
  * vectors (the F14 fill sentinel) get scale 0 and an all-zero code. */
object Quantize {

  /** Adds `scale` (double), `qvec` (array<int> in [-127,127]) and
    * `quant_rmse` (double, per-vector reconstruction RMSE) next to the
    * existing columns. `vecCol` must be an array of numeric type. */
  def int8(df: DataFrame, vecCol: String): DataFrame = {
    val v = s"transform($vecCol, x -> cast(x as double))"
    df
      .withColumn("scale",
        expr(s"aggregate($v, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))") / 127d)
      .withColumn("qvec", expr(
        s"""transform($v, x -> cast(
           |  case when scale = 0.0 then 0
           |       else greatest(-127, least(127, round(x / scale))) end as int))""".stripMargin))
      .withColumn("quant_rmse", sqrt(
        expr(s"aggregate(zip_with($v, qvec, (x, q) -> pow(x - q * scale, 2)), cast(0.0 as double), (a, e) -> a + e)")
          / greatest(expr(s"size($vecCol)"), lit(1))))
  }

  /** Serving-table form of [[int8]]: ONLY (id, scale, qvec) with
    * TINYINT codes — the compact broadcast payload (the 4× cut is the
    * point, so no retained source columns, no rmse column). Zero
    * vectors here carry scale 1.0 and an all-zero code (division-safe;
    * [[cosTopK]] ranks them last via the qaa = 0 sentinel), unlike
    * [[int8]]'s scale-0 convention which preserves reconstruction
    * semantics. */
  def int8Compact(emb: DataFrame, idCol: String = "id", vecCol: String = "vec"): DataFrame =
    emb
      .withColumn("__mx", expr(s"aggregate($vecCol, 0.0d, (a, x) -> greatest(a, abs(x)))"))
      .withColumn("scale",
        when(col("__mx") === 0.0, lit(1.0)).otherwise(col("__mx") / 127.0))
      .select(col(idCol), col("scale"),
        expr(s"transform($vecCol, x -> cast(least(greatest(round(x / scale), -127.0d), 127.0d) as tinyint))")
          .as("qvec"))

  /** Exact top-k by QUANTIZED cosine: the per-vector scale cancels in
    * cosine, so scoring is a pure function of EXACT INTEGER dot
    * products (every product ≤ 127², 64-dim sums far inside double's
    * exact-int range) — order-independent and oracle-replayable, which
    * stock int8 serving is not. Rank by (qcos desc, item id); zero
    * vectors score the −2 sentinel, exactly like [[CosineKnn]]'s
    * kernels. Physical shape is the relational broadcast form —
    * quantized serving exists to make the broadcast side small; at
    * catalog scale compose with the ANN family instead. */
  def cosTopK(queries: DataFrame, items: DataFrame, k: Int,
              excludeSelf: Boolean = false): DataFrame = {
    require(k >= 1, "quantized topK: k >= 1")
    def dot(a: String, b: String) =
      expr(s"aggregate(zip_with($a, $b, (x, y) -> cast(x as bigint) * cast(y as bigint)), 0L, (acc, v) -> acc + v)")
    val q = int8Compact(queries).select(col("id").as("query_id"), col("qvec").as("qq"))
      .withColumn("qaa", dot("qq", "qq"))
    val it = int8Compact(items).select(col("id").as("item_id"), col("qvec").as("iq"))
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
