package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic dense 1..N index over distinct keys, in key order —
  * the "give every dimension member a contiguous integer id" primitive
  * (negative sampling draws, embedding tables, bitmap indexes all need
  * it). `row_number() OVER (ORDER BY key)` computes this but funnels
  * the whole table through ONE task's sort (the single-partition
  * window trap this repo documents on q106/q113); this is the
  * decomposed form:
  *
  *   1. range-repartition by key (the only exchange);
  *   2. per-partition local row_number (parallel sorts);
  *   3. per-partition counts → cumulative offsets on a window of
  *      #partitions rows (skinny by construction) → broadcast join.
  *
  * The output — global position in key order — is INVARIANT to where
  * the range boundaries fall, so run-to-run determinism does not
  * depend on RangePartitioner's sampling. Keys must be distinct
  * (enforce upstream with `.distinct()`).
  */
object DenseIndex {

  /** @return df's columns plus `idx` (long, 1-based, dense in `key`
    *         order) */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val local = df.repartitionByRange(parts, col(key))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lr", row_number().over(
        Window.partitionBy("__pid").orderBy(col(key))))
      // eager checkpoint: `local` feeds BOTH the offsets aggregate and
      // the output join. Without pinning, the two branches may each
      // re-execute the range exchange (exchange reuse is best-effort),
      // and RangePartitioner re-SAMPLES boundaries per execution — a
      // __pid meaning one thing in the offsets and another in the rows
      // yields duplicated/gapped ids (observed: idx 1443 in a
      // 1437-key set, order-dependent flake). One materialized layout
      // makes the invariance argument in the scaladoc actually hold.
      .localCheckpoint(true)
    val offs = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(
        sum("__c").over(Window.orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    local.join(broadcast(offs), Seq("__pid"))
      .withColumn("idx", col("__lr") + col("__off"))
      .drop("__pid", "__lr", "__off")
  }
}
