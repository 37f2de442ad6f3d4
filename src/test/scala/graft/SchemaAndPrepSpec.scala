package graft

import graft.prep.Preprocess
import graft.schema.TypedCsv
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaAndPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpCsv(content: String): String = {
    val f = java.nio.file.Files.createTempFile("graft", ".csv")
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("TypedCsv parses string, string_list, number headers (S1)") {
    val p = tmpCsv(
      "item_id::string,tags::string_list,score::number\n" +
        "a,x::y::z,1.5\n" +
        "b,solo,2\n")
    val df = TypedCsv.read(spark, p)
    assert(df.schema("item_id").dataType == StringType)
    assert(df.schema("tags").dataType.isInstanceOf[ArrayType] &&
      df.schema("tags").dataType.asInstanceOf[ArrayType].elementType == StringType)
    assert(df.schema("score").dataType == DoubleType)
    val row = df.filter($"item_id" === "a").first()
    assert(row.getSeq[String](1) == Seq("x", "y", "z"))
    assert(row.getDouble(2) == 1.5)
  }

  test("TypedCsv hard-fails on an unannotated header (graph.py:207-212)") {
    val p = tmpCsv("plain_name\nv\n")
    assertThrows[IllegalArgumentException](TypedCsv.read(spark, p))
  }

  test("TypedCsv write/read roundtrip preserves types and list cells") {
    val df = Seq(("a", Seq("x", "y"), 2.0)).toDF("id", "tags", "score")
    val dir = java.nio.file.Files.createTempDirectory("graftw").toString + "/out"
    TypedCsv.write(df, dir)
    val back = TypedCsv.read(spark, dir)
    assert(back.first().getSeq[String](1) == Seq("x", "y"))
  }

  test("binarize maps >= threshold to 1.0 else 0.0 (P6)") {
    val r = Seq((1L, 1L, 4.0), (1L, 2L, 2.0), (2L, 1L, 3.0))
      .toDF("user_id", "item_id", "rating")
    val out = Preprocess.binarize(r, 3.0).select("rating")
      .as[Double].collect().sorted
    assert(out.toSeq == Seq(0.0, 1.0, 1.0))
  }

  test("k-core uses per-iteration snapshots: no intra-round cascade (methods.py:35-44)") {
    // users 1,2,3 rate items; user-target k=2.
    // u1 has 2 ratings, u2 has 2, u3 has 1 -> round 1 kills only u3.
    // After u3's removal item degrees change, but a SECOND user round
    // (snapshot recomputed) must kill nobody (user degrees unchanged).
    val r = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0),
      (2L, 10L, 5.0), (2L, 12L, 5.0),
      (3L, 11L, 5.0)
    ).toDF("user_id", "item_id", "rating")
    val kc = new graft.prep.KCoreCaches
    val afterUser = Preprocess.filterKCore(r, 2, "user", 10, kc)
    assert(afterUser.select("user_id").distinct().as[Long].collect().toSet == Set(1L, 2L))
    // item pass with k=2 on the result: item 10 deg 2 survives; 11,12 deg 1 die
    val afterItem = Preprocess.filterKCore(afterUser, 2, "item", 1, kc)
    assert(afterItem.select("item_id").distinct().as[Long].collect().toSet == Set(10L))
    // alternating semantics: one more user pass now kills u1,u2? deg=1 < 2 -> all gone
    assert(Preprocess.filterKCore(afterItem, 2, "user", 1, kc).count() == 0)
    // caller-owned cache contract: drop this scope's kill-set caches so
    // they don't outlive this test in the shared suite session
    kc.release()
  }

  test("k-core respects the iterations bound") {
    // chain where alternate-target cascades would continue, but a
    // single-target pass converges after one effective iteration
    val r = Seq((1L, 10L, 1.0), (2L, 10L, 1.0), (2L, 11L, 1.0))
      .toDF("user_id", "item_id", "rating")
    val kc = new graft.prep.KCoreCaches
    val once = Preprocess.filterKCore(r, 2, "user", 1, kc)
    assert(once.select("user_id").distinct().as[Long].collect().toSet == Set(2L))
    // second iteration removes nothing further (user degrees are stable)
    val twice = Preprocess.filterKCore(r, 2, "user", 5, kc)
    assert(twice.count() == once.count())
    kc.release()
  }

  test("decayedPriorCount: hand-worked half-life buckets, strictly-prior only") {
    // user 1, H=100: ts 0,50 (bucket 0), 150 (b1), 250,260 (b2);
    // user 2 isolated (no cross-user leakage)
    val ev = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 150L),
      (1L, 13L, 250L), (1L, 14L, 260L),
      (2L, 10L, 55L))
      .toDF("user_id", "item_id", "ts")
    val out = graft.prep.TemporalFeatures.decayedPriorCount(ev, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((1L, 10L)) == 0L) // first event: nothing prior
    assert(out((1L, 11L)) == 1000000L) // one same-bucket prior
    assert(out((1L, 12L)) == 1000000L) // bucket0 count 2 at k=1: 2*500000
    // k=1: b1 count 1 -> 500000; k=2: b0 count 2 -> 2*250000
    assert(out((1L, 13L)) == 1000000L)
    assert(out((1L, 14L)) == 2000000L) // + the same-bucket ts=250 event
    assert(out((2L, 10L)) == 0L)
  }

  test("decayedPriorCount: events beyond maxBuckets half-lives weigh zero") {
    val ev = Seq((1L, 10L, 0L), (1L, 11L, 100L * 45)).toDF("user_id", "item_id", "ts")
    val out = graft.prep.TemporalFeatures.decayedPriorCount(ev, 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(out((1L, 11L)) == 0L) // 45 half-lives old: outside the 40-bucket window
  }
}
