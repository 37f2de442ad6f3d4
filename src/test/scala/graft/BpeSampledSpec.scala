package graft

import graft.text.Bpe
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.text.Bpe.trainSampled]] (the r12 verdict's #6): sampled
  * driver-local merge learning must equal the distributed per-round
  * trainer when the sample covers the corpus, stay stable under real
  * subsampling on a frequency-skewed corpus, and run a TOTAL Spark-job
  * count independent of nMerges — the property that makes a 50k-merge
  * production vocabulary tractable. */
class BpeSampledSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("sample >= corpus: trainSampled == train merge-for-merge") {
    val docs = Seq(
      (1L, (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" ")),
      (2L, (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")),
      (3L, "the quick brown fox the quick brown fox the slow brown dog"))
      .toDF("doc_id", "text")
    val full = Bpe.train(docs, 8)
    val sampled = Bpe.trainSampled(docs, 8, sampleDocs = 100L, seed = 42L)
    assert(sampled == full, s"sampled $sampled != full $full")
  }

  test("real subsample reproduces the full merge table on a skewed corpus") {
    // 60 docs, each repeating the same dominant phrases — any
    // majority sample preserves the pair-frequency ORDER, so the
    // merge tables agree (the production claim: high-frequency pairs
    // decide the vocab, and they survive sampling)
    val rnd = new scala.util.Random(5)
    val docs = (1L to 60L).map { i =>
      val fill = Seq.fill(3)(Seq("zq" + rnd.nextInt(1000)).mkString)
      (i, (Seq.fill(20)("lowest") ++ Seq.fill(12)("newer") ++
        Seq.fill(6)("wider") ++ fill).mkString(" "))
    }.toDF("doc_id", "text")
    val full = Bpe.train(docs, 6)
    val sampled = Bpe.trainSampled(docs, 6, sampleDocs = 30L, seed = 7L)
    assert(sampled == full,
      s"half-sample drifted: sampled $sampled != full $full")
  }

  test("total job count is independent of nMerges (O(1) driver round-trips)") {
    val docs = Seq(
      (1L, Seq.fill(30)("abcdefgh ijklmnop").mkString(" ")),
      (2L, Seq.fill(30)("qrstuvwx yzabcdef").mkString(" ")))
      .toDF("doc_id", "text").cache()
    docs.count()
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        synchronized { jobs += 1 }
    }
    def countJobs(f: => Unit): Int = {
      spark.sparkContext.addSparkListener(listener)
      jobs = 0
      try { f; Thread.sleep(500) } // let queued job-start events drain
      finally spark.sparkContext.removeSparkListener(listener)
      jobs
    }
    val j4 = countJobs { Bpe.trainSampled(docs, 4, 100L, 42L) }
    val j16 = countJobs { Bpe.trainSampled(docs, 16, 100L, 42L) }
    assert(j4 == j16,
      s"job count grew with nMerges: $j4 at 4 merges vs $j16 at 16")
    docs.unpersist()
  }
}
