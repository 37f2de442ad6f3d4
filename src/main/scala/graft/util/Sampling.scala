package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-set assembly (driver mandate:
  * large-scale pipeline operations). Every predicate is a pure function
  * of the row's key columns and the seed — reproducible across retries,
  * repartitioning, and cluster-size changes (the same doctrine as
  * `EdgeSplits.portableHash`, SURVEY §4.5), and replayable verbatim in
  * a SQL oracle: the first 8 hex chars of an md5 compare
  * lexicographically exactly like the 32-bit integer they encode, so
  * `keep` becomes a string threshold — no float, no RNG state.
  */
object Sampling {

  /** Keep-predicate: true for ~`keep` of the key space. `keep` strictly
    * in (0, 1); key columns are rendered with '|' separators exactly as
    * `CAST(col AS VARCHAR) || '|' || ...` renders them in the oracle.
    *
    * NULL semantics match SQL concatenation: a NULL key column nulls the
    * whole key, the predicate evaluates NULL, and the row is DROPPED —
    * concat (not concat_ws, which silently skips nulls and would keep or
    * drop every null-key row as one correlated block). Keys containing
    * the '|' separator make multi-column keys ambiguous (('x|y','z') ==
    * ('x','y|z')); both engines render identically so parity holds, but
    * pick separator-free key columns (ids) for independence. */
  def hashKeep(keep: Double, seed: Long, keyCols: Seq[Column]): Column = {
    require(keep > 0 && keep < 1, s"keep must be in (0,1), got $keep")
    val threshold = f"${(keep * 4294967296L).toLong}%08x"
    val key = keyCols.map(_.cast("string"))
      .reduceLeft((a, b) => concat(a, lit("|"), b))
    substring(md5(concat(key, lit("|"), lit(seed.toString))), 1, 8) < lit(threshold)
  }

  /** Hash-Bernoulli sample: keep each row iff [[hashKeep]] holds on its
    * key columns. */
  def bernoulli(df: DataFrame, keep: Double, seed: Long, keyCols: Seq[String]): DataFrame =
    df.filter(hashKeep(keep, seed, keyCols.map(col)))

  /** Class downsample — the negative-sampling step after labeling
    * (positives are rare, negatives are the corpus): rows whose
    * `labelCol` equals `targetClass` are kept at rate `keep`; every
    * other row survives. One narrow codegen'd filter, no shuffle, no
    * count pass. */
  def downsampleClass(df: DataFrame, labelCol: String, targetClass: Int,
                      keep: Double, seed: Long, keyCols: Seq[String]): DataFrame =
    df.filter(col(labelCol) =!= targetClass || hashKeep(keep, seed, keyCols.map(col)))
}
