package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fold-major report pivot (SURVEY §2.8 M9): the reference writes wide
  * CSVs `model, fold-{i}_{metric}, ..., {metric}_mean, {metric}_std`
  * with POPULATION std (np.std ddof=0 — `framework/reporter/
  * report.py:42-54`, `experiment.py:93-106`).
  */
object Reporter {

  /** metrics: (model, fold, value) -> one row per model with
    * fold-1..fold-k columns plus mean and stddev_pop. */
  def foldPivot(metrics: DataFrame, k: Int, metricName: String): DataFrame = {
    val folds = metrics.groupBy("model").pivot("fold", 1 to k)
      .agg(round(first("value"), 6))
      .select(col("model") +: (1 to k).map(i =>
        col(i.toString).as(s"fold-${i}_$metricName")): _*)
    val stats = metrics.groupBy("model").agg(
      round(avg("value"), 6).as(s"${metricName}_mean"),
      round(coalesce(stddev_pop(col("value")), lit(0.0)), 6).as(s"${metricName}_std"))
    folds.join(stats, Seq("model"))
  }

  /** CSV sink matching the reference's writer (S6, report.py:25-29):
    * single header file per report. */
  def writeCsv(report: DataFrame, path: String): Unit =
    report.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Project the wide in-memory report onto the reference's CSV artifact
    * shape (report.py:31-63): FOLD-major metric columns then per-metric
    * mean/std for k-fold runs; plain `{metric}@{k}` columns — no fold
    * prefix, no mean/std — for the single-split (hold-out) case; never
    * any execution_time columns (those live in the separate
    * ExecutionTimesReporter file). The returned DataFrame keeps the full
    * metric-major layout for programmatic consumers; only the written
    * artifact takes this shape. */
  def referenceArtifact(report: DataFrame, metricNames: Seq[String], k: Int,
                        nFolds: Int): DataFrame = {
    if (nFolds > 1) {
      val foldCols = for (f <- 1 to nFolds; m <- metricNames)
        yield col(s"fold-${f}_$m@$k")
      val statCols = metricNames.flatMap(m =>
        Seq(col(s"$m@${k}_mean"), col(s"$m@${k}_std")))
      report.select(col("model") +: (foldCols ++ statCols): _*)
    } else
      report.select(col("model") +:
        metricNames.map(m => col(s"fold-1_$m@$k").as(s"$m@$k")): _*)
  }

  /** Machine-spec string embedded in the execution-times report's model
    * name (report.py:99: `{model} (CPU: ...; RAM: ...GB; GPUs: [...])`).
    * JVM equivalents of cpuinfo/psutil/GPUtil; no GPU probe exists in
    * the JVM, and Spark-side compute is CPU-only here, so GPUs is the
    * honest empty list. */
  lazy val machineSpec: String = {
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val ramGb = os match {
      case b: com.sun.management.OperatingSystemMXBean =>
        math.round(b.getTotalMemorySize / (1024.0 * 1024 * 1024))
      case _ => -1L
    }
    s"CPU: ${os.getArch} x${os.getAvailableProcessors}; RAM: ${ramGb}GB; GPUs: []"
  }
}
