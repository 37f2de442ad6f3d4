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
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
    // explicit path -> external table: callers that may run concurrently
    // (Verify/Bench) key it per run instead of sharing the warehouse dir
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

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
    import org.apache.spark.storage.StorageLevel
    // The small side is needed three times (emptiness probe, the
    // filter's treeAggregate, the exact join's build), so its key
    // projection is persisted here: the probe fills the cache, the
    // bloom build reads it back, and the small side's ORIGINAL plan
    // executes once more when the caller runs the join — 2 executions
    // total instead of 3, without leaking a cache entry past this call
    // (the unpersist below is lazy; a caller that persists `small`
    // itself still gets down to 1).
    val keys = small.select(col(key)).persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // stat.bloomFilter NPEs on zero rows, and an empty build side has
      // an exact answer anyway
      if (keys.isEmpty) return big.join(keys, Seq(key), "left_semi")
      val bf = keys.stat.bloomFilter(key, expectedItems, fpp)
      val bc = big.sparkSession.sparkContext.broadcast(bf)
      val might = udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      // no distinct on the build side: left_semi ignores duplicate build rows
      big.filter(might(col(key)))
        .join(small.select(col(key)), Seq(key), "left_semi")
    } finally keys.unpersist(blocking = false)
  }
}
