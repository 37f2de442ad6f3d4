package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-writer-wins key compaction — the dataset-versioning primitive
  * (CDC merge / SCD type-1 / snapshot compaction) behind training-
  * corpus refreshes: union the base snapshot with update batches that
  * carry a version column, keep per key the row with the greatest
  * (version, tieBreaks...). Immutable-input analogue of a MERGE INTO.
  *
  * Scale shape: one exchange (the key-partitioned window); no join, so
  * a hot key degrades one sort partition rather than a build side.
  * Update batches are normally a vanishing fraction of the base — AQE
  * coalesces the mostly-empty post-union partitions.
  */
object Upsert {

  /** All frames must share a schema (unionByName). `orderCols` must
    * total-order rows within a key (version first, then tiebreaks) —
    * otherwise last-wins is nondeterministic under retries. */
  def compact(batches: Seq[DataFrame], key: String, orderCols: Seq[String]): DataFrame = {
    require(batches.nonEmpty, "compact needs at least one batch")
    require(orderCols.nonEmpty, "compact needs at least one order column")
    val all = batches.reduce(_ unionByName _)
    val w = Window.partitionBy(key).orderBy(orderCols.map(c => col(c).desc): _*)
    all.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Snapshot diff — the audit companion to [[compact]]: classify every
    * key across two dataset versions as added / removed / changed /
    * unchanged by comparing a fingerprint column (keys must be unique
    * per side). One join exchange pair; only (key, fingerprint) ever
    * moves, never payloads — which is what makes auditing a 100 TB
    * corpus refresh a fingerprint-table problem. */
  def diff(base: DataFrame, next: DataFrame, key: String, fpCol: String): DataFrame = {
    val b = base.select(col(key), col(fpCol).as("__fp_b"), lit(true).as("__in_b"))
    val n = next.select(col(key), col(fpCol).as("__fp_n"), lit(true).as("__in_n"))
    b.join(n, Seq(key), "full_outer")
      .select(col(key),
        when(col("__in_b").isNull, "added")
          .when(col("__in_n").isNull, "removed")
          .when(col("__fp_b") =!= col("__fp_n"), "changed")
          .otherwise("unchanged").as("status"))
  }
}
