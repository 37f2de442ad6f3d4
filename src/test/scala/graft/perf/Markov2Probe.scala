package graft.perf

import org.apache.spark.sql.functions._

/** Long-tail session-skew probe for the order-2 Markov kernel
  * (`Test/runMain graft.perf.Markov2Probe`): 5M events over 200k users
  * with a zipf-ish activity tail PLUS one hyperactive user carrying
  * 200k events — the per-user collect_list state the groupBy-collect
  * walk must survive. Reports wall seconds and output sizes. */
object Markov2Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    val n = 5000000L
    val events = spark.range(n).select(
      // zipf-ish: low ids get quadratically more events; id 0 is the
      // hyperactive user (~4% of the corpus in one timeline)
      when(pmod(col("id"), lit(25)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(200000L))).as("user_id"),
      pmod(xxhash64(col("id"), lit(2)), lit(5000L)).as("item_id"),
      lit(5.0).as("rating"),
      (col("id") * 7L % 1000000000L).as("ts"))
      .persist()
    println(s"events=${events.count()} hyper=${events.filter(col("user_id") === 0).count()}")
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$what: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val t2 = time("transitions2") {
      val d = graft.model.MarkovNextItem.transitions2(events, minCount = 2L, k = 5)
      d.count()
    }
    println(s"t2 rows=$t2")
    val recs = time("recommendBackoff") {
      graft.model.MarkovNextItem.recommendBackoff(events, minCount = 2L, kTrans = 5, k = 5).count()
    }
    println(s"recs rows=$recs")
    spark.stop()
  }
}
