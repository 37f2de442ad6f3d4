package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway stage-timing harness for the headline fold (not part of the
  * library surface). */
object DebugHeadline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val model = args.headOption.getOrElse("transE")

    val ratings = Tables.ratings(spark, sfDir).select(
      col("user_id").cast("string").as("user_id"),
      col("item_id").cast("string").as("item_id"), col("rating"), col("ts"))
    time("materialize-ratings")(ratings.count())
    val assigned = graft.split.EdgeSplits.kFoldRandom(ratings, 2, "user", 42L).cache()
    val train = assigned.filter(col("fold") =!= 1).drop("fold")
    time("split")(train.count())
    val rec = model match {
      case "transE" => new graft.kge.KgeRecommender(Map(
        "model" -> "transE", "embedding_dim" -> "150", "epochs" -> "5", "seed" -> "42"))
      case _ => new graft.walk.DeepWalkRecommender(Map(
        "biased" -> "true", "n_walks" -> "50", "walk_len" -> "10",
        "embedding_size" -> "64", "epochs" -> "1", "w2v_partitions" -> "16", "seed" -> "42"))
    }
    if (model == "node2vec-parts") {
      import graft.graph.KGraph
      import graft.walk.RandomWalks
      val ratingEdges = train.select(
        KGraph.userLabel(col("user_id")).as("src_label"),
        KGraph.itemLabel(col("item_id")).as("dst_label"))
      val nodes = KGraph.relabel(
        ratingEdges.select(col("src_label").as("label"))
          .union(ratingEdges.select(col("dst_label").as("label"))))
      val intEdges = ratingEdges
        .join(nodes.withColumnRenamed("label", "src_label"), Seq("src_label"))
        .withColumnRenamed("node_id", "src")
        .join(nodes.withColumnRenamed("label", "dst_label"), Seq("dst_label"))
        .withColumnRenamed("node_id", "dst").select("src", "dst")
      val adj = time("adjacency")({ val a = RandomWalks.adjacency(intEdges).cache(); a.count(); a })
      val walks = time("walks")({
        val w = RandomWalks.biasedWalks(spark, adj, nodes.select(col("node_id").as("node")),
          50, 10, 1.0, 1.0, 42).persist()
        w.count(); w
      })
      val nNodes = nodes.count()
      val corpus = time("sgns-collect")(
        walks.select(col("path").cast("array<int>")).rdd.map(_.getSeq[Int](0).toArray).collect())
      time("sgns-fit")(graft.walk.SkipGram.fitLocal(corpus, nNodes.toInt, 64, 5, 1,
        0.025, 5, 0, 42L, Runtime.getRuntime.availableProcessors()))
      time("mllib-w2v-fit") {
        val sentences = walks.select(expr("transform(path, x -> cast(x as string))").as("words"))
        new org.apache.spark.ml.feature.Word2Vec()
          .setInputCol("words").setOutputCol("w2v").setVectorSize(64)
          .setWindowSize(5).setMaxIter(1).setMinCount(0).setNumPartitions(32)
          .setSeed(42L).fit(sentences)
      }
      spark.stop(); return
    }
    val fitted = time("train")(rec.train(spark, train, None, None))
    time("recommend1")(fitted.recommend(5).count())
    println(fitted.recommend(5).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .linesIterator.filter(l => l.contains("Exchange") || l.contains("Window") ||
        l.contains("Sort") || l.contains("BroadcastNestedLoop")).mkString("\n"))
    val recs = time("recommend2")(
      { val r = fitted.recommend(5).persist(); r.count(); r })
    time("map")(graft.eval.Metrics.mapAtK(recs, assigned.filter(col("fold") === 1), 5, 3.0).first())
    time("ndcg")(graft.eval.Metrics.ndcgAtK(recs, assigned.filter(col("fold") === 1), 5, 3.0).first())
    spark.stop()
  }
}
