package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins that the pins themselves are reproducible: every committed
  * golden parquet under `goldens/` must be BIT-identical to a fresh
  * in-process run of its query on this JVM — the same comparison
  * [[GoldenGen]] output would produce, without touching the files.
  * `exceptAll` compares doubles by exact binary value, so a seeded
  * kernel that drifted by one ulp on a fresh JVM fails here before it
  * can fail the driver's hash gate. Runs at sf0.001 (goldens are keyed
  * by the scale's ratings count, so the one file serves every sf).
  */
class GoldenRegenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val goldenNames = Seq(
    "q40_deepwalk_recs", "q41_transe_recs",
    "q49_fuzzy_extract_one", "q67_distmult_recs",
    "q68_rotate_recs", "q69_complex_recs", "q70_transh_recs",
    "q71_transr_recs", "q72_transd_recs", "q73_rescal_recs",
    "q74_tucker_recs", "q162_bpr_recs", "q164_als_recs",
    "q168_als_implicit_recs", "q176_item2vec_recs")

  goldenNames.foreach { name =>
    test(s"golden $name reproduces bit-exactly on a fresh run") {
      val n = Tables.ratings(spark, dir).count()
      val committed = spark.read.parquet(s"/root/repo/goldens/$name.parquet")
        .filter(col("n_ratings") === n).drop("n_ratings")
      assert(committed.count() > 0, s"$name has no rows keyed to sf0.001 (n_ratings=$n)")
      val live = SparkEntry.queries(name)(spark, dir)
        .select(committed.columns.map(col).toIndexedSeq: _*)
      assert(live.count() == committed.count(), s"$name row count drifted")
      assert(live.exceptAll(committed).isEmpty && committed.exceptAll(live).isEmpty,
        s"$name content drifted from the committed golden")
    }
  }
}
