package graft.util

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out join patterns the 100 TB deployment leans on (SURVEY §4 /
  * the driver mandate's partitioning bullet). Verified at the plan
  * level in ScaleJoinsSpec — the point of each helper is the shuffle it
  * REMOVES, which value-level tests can't see.
  */
object ScaleJoins {

  /** Write both sides bucketed by the join key so later equi-joins are
    * co-located: zero Exchange in the join plan, the bucketing IS the
    * shuffle, paid once at write time. The standard layout for a fact
    * table joined repeatedly on the same key (ratings by user). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Salted join for skewed keys: explode the SMALL side `salt` ways,
    * tag the big side with a deterministic salt in [0, salt), join on
    * (key, salt). Each hot key's rows spread over `salt` reducers
    * instead of one straggler. Equivalent row-for-row to the plain
    * equi-join (inner). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt.toLong)).cast("int"))
    val smallSalted = small
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    bigSalted.join(smallSalted, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-pruned semi join (long keys): build a Bloom filter over the
    * small side's key ON THE EXECUTORS (`stat.bloomFilter` is a
    * treeAggregate — only the filter's bits reach the driver),
    * broadcast it, and pre-filter the big side BEFORE its shuffle.
    * Rows that cannot match never leave their input partition: at
    * 100 TB that is the difference between shuffling the fact table
    * and shuffling its matching fraction. Bloom false positives are
    * removed by the exact semi join that follows, so the composite is
    * row-identical to the plain left_semi (q98 pins this under a
    * value oracle). Spark's runtime bloom injection
    * (spark.sql.optimizer.runtimeFilter.bloomFilter.enabled) does the
    * same transparently where its cost model fires; the explicit form
    * is guaranteed, survives operators the optimizer won't inject
    * through, and its filter is reusable across several scans. */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
                    expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    // Note: the small side's plan executes twice — once for the filter's
    // treeAggregate, once as the exact join's build — plus a take(1) for
    // the emptiness probe (stat.bloomFilter NPEs on zero rows, and an
    // empty build side has an exact answer anyway). Callers with an
    // expensive small-side plan should persist it first.
    if (small.isEmpty) return big.join(small.select(col(key)), Seq(key), "left_semi")
    val bf = small.stat.bloomFilter(key, expectedItems, fpp)
    val bc = big.sparkSession.sparkContext.broadcast(bf)
    val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
    // no distinct on the build side: left_semi ignores duplicate build rows
    big.filter(might(col(key)))
      .join(small.select(col(key)), Seq(key), "left_semi")
  }
}
