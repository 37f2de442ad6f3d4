package graft.perf

import org.apache.spark.sql.functions._

/** Scratch probe: implicit-family baselines on the binarized MlFixture
  * fold (not part of the suite — run with `Test/runMain graft.perf.HkvSweep`). */
object HkvSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val r = graft.prep.Preprocess.binarize(graft.MlFixture.ratings(spark, 42L), 3.0)
    val folded = graft.split.EdgeSplits.kFold(r, 5, "user", Seq(col("item_id"))).cache()
    val train = folded.filter(col("fold") =!= 1).select("user_id", "item_id", "rating").cache()
    val test = folded.filter(col("fold") === 1).select("user_id", "item_id", "rating").cache()
    train.count(); test.count()
    def mapAt5(recs: org.apache.spark.sql.DataFrame): Double =
      graft.eval.Metrics.meansAtK(
        recs.select(col("user_id"), col("item_id"), col("rank")), test, 5, 1.0)
        .collect().head.getDouble(0)
    val pop = mapAt5(graft.model.PopularityRecommender.recommend(train, 5))
    println(f"POP MAP@5=$pop%.5f")
    val hkv = mapAt5(graft.model.AlsImplicit.recs(spark, train,
      dim = 8, iters = 5, lambda = 0.1, alpha = 5.0, seed = 42L, k = 5))
    println(f"HKV(8,5.0,0.1) MAP@5=$hkv%.5f")
    val bpr = mapAt5(graft.model.BprMf.recs(spark, train, minRating = 1.0,
      dim = 16, epochs = 20, lr = 0.5, reg = 0.005, seed = 42L, k = 5))
    println(f"BPR MAP@5=$bpr%.5f")
    spark.stop()
  }
}
