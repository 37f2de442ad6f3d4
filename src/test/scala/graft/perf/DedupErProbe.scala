package graft.perf

import graft.text.{Dedup, EntityResolution}
import graft.text.EntityResolution._
import graft.util.{Kmv, Profile}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the r13 continuation operators:
  * `runMain graft.perf.DedupErProbe [nDocs] [nEr]`
  *
  *  - KMV set algebra over 5M-key sides (k = 1024)
  *  - sorted-neighborhood dedup at `nDocs` (default 1M) synthetic docs
  *    with 1%% planted near-dups (window 10, bigram verify)
  *  - key-skew profile over 10M rows with a 10%% hot key
  *  - entity resolution at `nEr` (default 500k) records against a
  *    dirtied copy, two blocking keys
  *
  * All inputs are deterministic id-arithmetic synthetics (no data
  * files) so the probe measures the operators, not IO.
  */
object DedupErProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nEr = args.drop(1).headOption.map(_.toLong).getOrElse(500000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      // NOTE: driver heap must come from the JVM flags (-Xmx via
      // SBT_OPTS) — setting spark.driver.memory here would be a no-op
      // in an already-running local JVM
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    // --- KMV: two 5M-key sets with 50% overlap ---
    val a = spark.range(0L, 5000000L).select(col("id"))
    val b = spark.range(2500000L, 7500000L).select(col("id"))
    timed("kmv setOps 5M vs 5M (k=1024)") {
      Kmv.setOps(a, b, Seq("id"), k = 1024, seed = 42L).collect()
        .foreach(r => println("  " + r))
    }

    // --- SNM: nDocs synthetic 8-word docs, 1% planted near-dups (dup
    // rows copy the previous id's words with the tail replaced) ---
    // per-slot multiplier AND an intermediate large-prime mod: vocab
    // index (src * P + j) % 8191 alone depends only on src mod 8191, so
    // every doc would repeat every 8191 ids (~122 exact copies each —
    // measured as 8.6M SNM pairs instead of the planted ~10k); reducing
    // through 1e9+7 first keeps the full id in play
    val wordPrimes = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L,
      374761393L, 2869860233L, 3282749797L, 1609587929L).map(_.toString)
    val wordsExpr = (0 until 8).map { j =>
      s"concat('w', ((src * ${wordPrimes(j)} + $j) % 1000000007) % 8191)"
    }.mkString(", ")
    val docs = spark.range(0L, nDocs)
      .withColumn("src", when(col("id") % 100 === 99, col("id") - 1).otherwise(col("id")))
      .selectExpr("id as doc_id", "src",
        s"concat_ws(' ', $wordsExpr) as base")
      .withColumn("text",
        when(col("doc_id") % 100 === 99,
          concat(expr("substring(base, 1, length(base) - 2)"), lit("zz")))
          .otherwise(col("base")))
      .select("doc_id", "text")
    docs.persist(); timed("docs materialize")(println("  n = " + docs.count()))
    timed(s"sortedNeighborhood $nDocs docs w=10") {
      val pairs = Dedup.sortedNeighborhood(docs, w = 10, shingleK = 2,
        tPerMille = 500L, bucketChars = 4)
      println("  pairs = " + pairs.count())
      pairs.unpersist(blocking = false)
    }

    // --- keySkew: 10M rows, 10% on one hot key ---
    val skewed = spark.range(0L, 10000000L)
      .selectExpr("case when id % 10 = 0 then 'hot' else concat('k', id % 100000) end as k")
    timed("keySkew 10M rows (hot 10%)") {
      Profile.keySkew(skewed, Seq("k"), shufflePartitions = 32).collect()
        .foreach(r => println("  " + r))
    }

    // --- ER: nEr records vs dirtied copy, two blocking keys ---
    val erPrimes = Seq(1099511628211L, 2654435761L, 2246822519L, 3266489917L)
    val erWords = (0 until 4).map { j =>
      s"concat('n', ((id * ${erPrimes(j)} + $j) % 1000000007) % 5000)"
    }.mkString(", ")
    val cat = spark.range(0L, nEr)
      .selectExpr("id", s"concat_ws(' ', $erWords) as name",
        "concat('b', id % 1000) as brand", "cast(id % 100 as bigint) as size")
    val l = cat.select(col("id").as("left_id"), col("name").as("l_name"),
      col("brand").as("l_brand"), col("size").as("l_size"))
    val r = cat.select((col("id") + lit(100000000L)).as("right_id"),
      expr("regexp_replace(name, ' [^ ]+$', '')").as("r_name"),
      col("brand").as("r_brand"), col("size").as("r_size"))
    timed(s"entityResolution $nEr x $nEr") {
      val m = EntityResolution.resolve(l, r, "left_id", "right_id",
        blockKeys = Seq(
          (concat_ws("|", element_at(split(col("l_name"), " "), 1), col("l_brand")),
            concat_ws("|", element_at(split(col("r_name"), " "), 1), col("r_brand"))),
          (concat_ws("|", col("l_brand"), col("l_size")),
            concat_ws("|", col("r_brand"), col("r_size")))),
        fields = Seq(
          Field("name", "l_name", "r_name", TokenJaccardSim, 3L),
          Field("brand", "l_brand", "r_brand", ExactSim, 1L),
          Field("size", "l_size", "r_size", AbsDiffSim(5L), 1L)),
        minScore = 3000L)
      val matched = m.persist()
      val n = matched.count()
      val truth = matched.filter(col("right_id") - lit(100000000L) === col("left_id")).count()
      println(s"  matched = $n, truth-consistent = $truth")
      matched.unpersist(blocking = false)
    }
    spark.stop()
  }
}
