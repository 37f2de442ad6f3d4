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
}
