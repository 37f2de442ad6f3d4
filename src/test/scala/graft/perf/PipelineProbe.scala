package graft.perf

import org.apache.spark.sql.functions._

/** Scale probe for the round-9 pipeline operators: generates synthetic
  * inputs well past the sf0.1 test scale (default 10M events / 1M docs
  * — override with N_EVENTS / N_DOCS) and measures wall + process-CPU
  * for the as-of join, shard assignment, chunking, and SRP bucket
  * kernels. Run: `sbt "Test/runMain graft.perf.PipelineProbe"`.
  *
  * The inputs are hash-generated (no RNG state, no disk), so the probe
  * measures operator cost, not scan cost. */
object PipelineProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(name: String, rows: Long)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$name%-22s rows=$rows%,d out=$out%,d wall=$wall%.2fs cpu=$cpu%.1fs throughput=${rows / wall / 1e6}%.1fM rows/s")
    }

    val nEvents = sys.env.getOrElse("N_EVENTS", "10000000").toLong
    val nDocs = sys.env.getOrElse("N_DOCS", "1000000").toLong

    // 1M users, ~20% purchases, hash-scattered event times over 30 days
    val events = spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_millis(lit(1700000000000L) + pmod(xxhash64(col("id"), lit(1)), lit(2592000000L))).as("ts"),
      pmod(xxhash64(col("id"), lit(2)), lit(1000000L)).as("user_id"),
      when(col("id") % 5 === 0, "purchase").otherwise("click").as("event_type"),
      (pmod(xxhash64(col("id"), lit(3)), lit(10000L)) / 100.0).as("value"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"events materialized: ${events.count()}")

    val clicks = events.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts", "value")
    val purchases = events.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts", "value")
    timed("asofBackward", nEvents) {
      graft.util.AsofJoin.asofBackward(clicks, purchases, Seq("user_id"),
        "ts", "ts", Seq("event_id", "value"), "event_id")
        .filter(col("asof_event_id").isNotNull).count()
    }

    timed("shard(64)", nEvents) {
      graft.util.Sampling.shard(events, 64, 5L, Seq("event_id"))
        .agg(max("shard_pos")).collect().head.getLong(0)
    }

    // ~1 KB docs from repeated hash hex
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 16).map(i =>
        lower(hex(xxhash64(col("id"), lit(i))))): _*).as("text"))
    timed("chunk(200,150)", nDocs) {
      graft.text.Chunking.chunk(docs, "text", 200, 150, Seq("doc_id")).count()
    }

    // SRP buckets over hash-generated 64-dim vectors
    val nVecs = nDocs / 10
    val vecs = spark.range(nVecs).select(col("id"),
      expr("transform(sequence(0, 63), d -> cast(pmod(xxhash64(id, d), 2000) - 1000 as double) / 1000)").as("vec"))
    timed("srpBuckets(4x8x64)", nVecs) {
      graft.knn.SrpLsh.buckets(vecs, "id", "vec", 64).count()
    }

    events.unpersist()
    spark.stop()
  }
}
