package graft.perf

import graft.model.UserKnn
import graft.util.TopK
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of q151 (userKNN) at bench scale:
  * `Test/runMain graft.perf.UserKnnMicro [sfDir]`. */
object UserKnnMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val ratings = graft.Tables.ratings(spark, dir)
    println(s"  ratings=${ratings.count()}")
    val rel = timed("rel (double-cap+ckpt)") {
      UserKnn.relevantCapped2(ratings, 4.0, 50, 50).localCheckpoint(true)
    }
    println(s"  rel=${rel.count()} users=${rel.select("user_id").distinct().count()} items=${rel.select("item_id").distinct().count()}")
    val cooc = timed("cooc pair join+agg") {
      rel.select(col("item_id"), col("user_id").as("user_a"))
        .join(rel.select(col("item_id"), col("user_id").as("user_b")), Seq("item_id"))
        .filter(col("user_a") < col("user_b"))
        .groupBy("user_a", "user_b").agg(count(lit(1)).as("cooc"))
        .filter(col("cooc") >= 2)
        .localCheckpoint(true)
    }
    println(s"  cooc=${cooc.count()}")
    val deg = rel.groupBy("user_id").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val sims = timed("sims") {
      cooc
        .join(deg.select(col("user_id").as("user_a"), col("deg").as("deg_a")), Seq("user_a"))
        .join(deg.select(col("user_id").as("user_b"), col("deg").as("deg_b")), Seq("user_b"))
        .select(col("user_a"), col("user_b"),
          expr(s"cooc * 1000000L div (deg_a + deg_b - cooc)").as("sim"))
        .localCheckpoint(true)
    }
    println(s"  sims=${sims.count()}")
    val sym = sims.select(col("user_a").as("user_id"), col("user_b").as("nbr_id"), col("sim"))
      .unionByName(sims.select(col("user_b").as("user_id"), col("user_a").as("nbr_id"), col("sim")))
    val nbrs = timed("nbrs topk") {
      TopK.perGroup(sym, Seq("user_id"), "sim", Seq("nbr_id"), 10).drop("rank")
        .localCheckpoint(true)
    }
    println(s"  nbrs=${nbrs.count()}")
    timed("cand+unseen+topk") {
      val cand = nbrs.join(rel.select(col("user_id").as("nbr_id"), col("item_id")), Seq("nbr_id"))
        .groupBy("user_id", "item_id").agg(sum("sim").as("score"))
      val unseen = cand.join(ratings.select("user_id", "item_id"),
        Seq("user_id", "item_id"), "left_anti")
      TopK.perGroup(unseen, Seq("user_id"), "score", Seq("item_id"), 5).count()
    }
    timed("full recs e2e (warm)") {
      UserKnn.recs(ratings, 4.0, 50, 50, 2, 10, 5).count()
    }
    spark.stop()
  }
}
