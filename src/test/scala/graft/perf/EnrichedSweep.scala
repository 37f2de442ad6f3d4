package graft.perf

import org.apache.spark.sql.functions._

/** Scratch probe: transE triples=all vs ratings on the enriched
  * fixture, across (dim, epochs). */
object EnrichedSweep {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    val r = graft.MlFixture.ratings(spark, 42L)
    val enr = graft.MlFixture.enriched(spark, 42L)
    val folded = graft.split.EdgeSplits.kFold(r, 2, "user", Seq(col("item_id"))).cache()
    val train = folded.filter(col("fold") =!= 1).select("user_id", "item_id", "rating", "ts").cache()
    val test = folded.filter(col("fold") === 1).select("user_id", "item_id", "rating")
    train.count()
    val props = graft.graph.KGraph.propertyEdges(enr, "item_id", isUser = false,
      Seq("subject", "abstract", "starring", "director", "distributor",
          "writer", "producer", "cinematography"))
    def mapAt5(recs: org.apache.spark.sql.DataFrame): Double =
      graft.eval.Metrics.meansAtK(
        recs.select(col("user_id"), col("item_id"), col("rank")), test, 5, 4.0)
        .collect().head.getDouble(0)
    for (dim <- Seq(32, 64); ep <- Seq(2, 5)) {
      def run(triples: String, p: Option[org.apache.spark.sql.DataFrame]) = {
        val rec = new graft.kge.KgeRecommender(Map("model" -> "transE",
          "embedding_dim" -> dim.toString, "epochs" -> ep.toString,
          "seed" -> "42", "triples" -> triples)).train(spark, train, p)
        val m = mapAt5(rec.recommend(5)); rec.release(); m
      }
      val a = run("all", props)
      val b = run("ratings", None)
      println(f"ENR dim=$dim ep=$ep all=$a%.5f ratings=$b%.5f lift=${a/b}%.2f")
    }
    spark.stop()
  }
}
