package graft.perf

import graft.text.{Dedup, TextOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Phase breakdown of q108 (six-stage pipeline) at bench scale:
  * `Test/runMain graft.perf.PipelineMicro [sfDir]`. */
object PipelineMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      println(f"  $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s  cpu ${(osBean.getProcessCpuTime - c0) / 1e9}%7.1f"); r
    }
    val docs = graft.Tables.t(spark, dir, "documents")
    val keptIds = timed("1 curation gate") {
      TextOps.curationKept(docs).select("doc_id").localCheckpoint(true)
    }
    val kept = docs.join(keptIds, Seq("doc_id"), "left_semi")
    val rewritten = timed("2 line dedup+reassemble") {
      val r = graft.text.LineDedup.dedupCorpus(kept, 3)
        .filter(col("n_kept") > 0)
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
        .select(col("doc_id"), col("source"),
          translate(col("text"), "\n", " ").as("text"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val pairs = timed("3a minhash lsh")(Dedup.minhashLsh(spark, rewritten, 8, 3, 0.8))
    val cc = timed("3b cc clusters")(Dedup.clusters(spark, rewritten, pairs))
    val canon = timed("3c canonical") {
      val c = Dedup.canonical(rewritten, cc).persist(StorageLevel.MEMORY_AND_DISK)
      c.count(); c
    }
    val selected = timed("4 token budget") {
      val scored = canon.select(col("doc_id"), col("source"),
        TextOps.qualityScore(col("text")).as("quality"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      val s = graft.prep.TokenBudget.select(scored, 1500L).localCheckpoint(true)
      s.count(); s
    }
    val packed = timed("5 sequence pack") {
      val packIn = canon.join(selected.select("doc_id"), Seq("doc_id"), "left_semi")
      graft.prep.SequencePack.pack(packIn, 512, groupWidth = 256L).localCheckpoint(true)
    }
    timed("6 shard+manifest") {
      val sharded = graft.util.Sampling.shard(
        selected.select("doc_id"), nShards = 4, seed = 5L, keyCols = Seq("doc_id"))
      packed.join(sharded.select("doc_id", "shard"), Seq("doc_id"))
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
          sum(when(col("spans_blocks"), 1L).otherwise(0L)).as("n_spanning"),
          md5(array_join(transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast("string")), ",")).as("ids_fp"))
        .count()
    }
    timed("full q108 e2e (warm)") {
      graft.SparkEntry.queries("q108_pipeline_e2e")(spark, dir).count()
    }
    spark.stop()
  }
}
