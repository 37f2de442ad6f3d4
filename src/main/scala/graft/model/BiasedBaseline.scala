package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Koren's regularized baseline rating predictor (the `b_ui = µ + b_u
  * + b_i` estimate of "Factorization Meets the Neighborhood", KDD'08
  * §2.1) — the rating-PREDICTION capability next to the engine's
  * top-k rankers, and the bias model every MF recommender initializes
  * from. All arithmetic in exact e6-scaled BIGINTs (ratings are whole
  * stars, so `rating·10⁶` is exact):
  *
  *   µ   = Σr div n                       (global mean)
  *   b_u = Σ_u (r − µ) div (λ₁ + n_u)     (shrunk user bias)
  *   b_i = Σ_i (r − µ − b_u) div (λ₂ + n_i)  (shrunk item bias)
  *   p   = clamp(µ + b_u + b_i, 1, 5)     (star range)
  *
  * Both engines truncate integer division toward zero INCLUDING
  * negative dividends (probed: −7 div 2 = −3 in Spark AND DuckDB), so
  * the shrunk biases — routinely negative — replay bit-for-bit.
  *
  * Scale shape: one broadcast 1-row µ, two map-side-combined
  * aggregations (user-keyed, then item-keyed over the b_u-joined
  * train), two left joins onto the test side (users/items unseen in
  * train fall back to bias 0 — the cold-start contract), one
  * user-keyed MSE aggregation. Overflow: per-row err² ≤ 1.6e13; a
  * user needs > 5.7e5 test rows to overflow the e12 sum — cast wider
  * upstream if a single key can exceed that.
  */
object BiasedBaseline {

  val Scale = 1000000L

  /** Per-user squared-error report → (user_id, n_test, mse_e12). */
  def mseByUser(train: DataFrame, test: DataFrame,
                lambda1: Long, lambda2: Long): DataFrame = {
    val tr = train.select(col("user_id"), col("item_id"),
      (col("rating") * Scale).cast("long").as("r"))
    val te = test.select(col("user_id"), col("item_id"),
      (col("rating") * Scale).cast("long").as("r"))
    val mu = tr.agg(expr("sum(r) div count(1)").as("mu"))
    val bu = tr.crossJoin(broadcast(mu))
      .groupBy("user_id")
      .agg(expr(s"sum(r - mu) div ($lambda1 + count(1))").as("bu"))
    val bi = tr.join(bu, Seq("user_id")).crossJoin(broadcast(mu))
      .groupBy("item_id")
      .agg(expr(s"sum(r - mu - bu) div ($lambda2 + count(1))").as("bi"))
    te.join(bu, Seq("user_id"), "left")
      .join(bi, Seq("item_id"), "left")
      .crossJoin(broadcast(mu))
      .select(col("user_id"), col("r"),
        greatest(lit(Scale), least(lit(5L * Scale),
          col("mu") + coalesce(col("bu"), lit(0L)) + coalesce(col("bi"), lit(0L))))
          .as("p"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_test"),
        expr("sum((r - p) * (r - p)) div count(1)").as("mse_e12"))
  }
}
