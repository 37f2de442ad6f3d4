package graft.knn

import org.apache.spark.sql.DataFrame
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
}
