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
}
