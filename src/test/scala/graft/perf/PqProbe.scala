package graft.perf

import org.apache.spark.sql.functions._

/** Scale probe for the PQ serving family (q188/q190/q192) at
  * 1-2 orders of magnitude past the sf tables: hash-generated
  * clustered embeddings (64-dim, 32 planted directions + noise), 100
  * queries, measuring train+encode+serve wall per kernel and the
  * candidate-restriction effect of the coarse lists.
  * Run: `sbt "Test/runMain graft.perf.PqProbe"` (N_VECS to override). */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
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
      println(f"$name%-34s rows=$rows%,d out=$out%,d wall=$wall%.2fs cpu=$cpu%.1fs")
    }

    val n = sys.env.getOrElse("N_VECS", "1000000").toLong
    // 32 planted directions + per-coordinate hash noise, mirroring the
    // spec fixtures at probe scale
    val emb = spark.range(n).select(col("id"), expr(
      """transform(sequence(0, 63), j -> cast(
        |  (cast(pmod(xxhash64(id % 32, j), 200) as int) - 100) / 100.0
        |  + (cast(pmod(xxhash64(id, j), 60) as int) - 30) / 100.0 as double))""".stripMargin)
      .as("vec"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"embeddings materialized: ${emb.count()} x 64")

    // flat PQ-ADC: every item pays the LUT sum (m=8 x 256-ish codes at
    // production; m=8 x 64 here keeps the Lloyd rounds probe-sized)
    timed("pq_adc(m=8,ksub=64)", n) {
      graft.knn.Pq.adcTopK(emb, "id", "vec", col("id") < 100,
        m = 8, ksub = 64, iters = 2, k = 10).count()
    }
    // flat PQ-ADC, SAMPLED codebooks (50k of n ids): Lloyd runs over
    // the bounded sample, assignment/serving stay full-corpus — the
    // wall should drop to scoring-dominated
    timed("pq_adc_sampled(50k ids)", n) {
      graft.knn.Pq.adcTopK(emb, "id", "vec", col("id") < 100,
        m = 8, ksub = 64, iters = 2, k = 10, trainSampleIds = 50000L).count()
    }
    // IVF-ADC: coarse lists cut the scanned candidates ~kc/nProbe x
    timed("ivf_adc(kc=64,nProbe=8)", n) {
      graft.knn.Pq.ivfAdcTopK(emb, "id", "vec", col("id") < 100,
        kc = 64, nProbe = 8, m = 8, ksub = 64, iters = 2, k = 10).count()
    }
    timed("ivf_adc_sampled(50k ids)", n) {
      graft.knn.Pq.ivfAdcTopK(emb, "id", "vec", col("id") < 100,
        kc = 64, nProbe = 8, m = 8, ksub = 64, iters = 2, k = 10,
        trainSampleIds = 50000L).count()
    }
    // residual IVF-PQ: same restriction + the recall-lever encoding
    timed("ivf_pq_residual(kc=64,nProbe=8)", n) {
      graft.knn.Pq.ivfPqTopK(emb, "id", "vec", col("id") < 100,
        kc = 64, nProbe = 8, m = 8, ksub = 64, iters = 2, k = 10).count()
    }
    timed("ivf_pq_residual_sampled(50k ids)", n) {
      graft.knn.Pq.ivfPqTopK(emb, "id", "vec", col("id") < 100,
        kc = 64, nProbe = 8, m = 8, ksub = 64, iters = 2, k = 10,
        trainSampleIds = 50000L).count()
    }
    spark.stop()
  }
}
