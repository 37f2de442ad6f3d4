package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import graft.text.Dsir
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dsir: exact agreement with a driver-side recount of the hashed
  * bucket models, target-steering direction, partition invariance. */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog", "en"),
    (2L, "of the house and garden", "en"),
    (3L, "le chat et la maison", "fr"),
    (4L, "la maison et le jardin", "fr"),
    (5L, "the garden of the house", "en"),
    (6L, "le jardin the cat", "fr")
  ).toDF("doc_id", "text", "lang")

  private def h52(seed: Long, s: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$s|$seed".getBytes(StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString.substring(0, 13)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Driver-side recount with the identical formula. */
  private def expected(nBuckets: Int, seed: Long): Map[Long, (Long, Long)] = {
    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val toks = rows.flatMap { case (id, text, lang) =>
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .map(w => (id, h52(seed, w) % nBuckets, lang == "en"))
    }
    val db = toks.groupBy(t => (t._1, t._2)).map { case ((id, b), ts) => (id, b, ts.size.toLong) }
    val src = db.groupBy(_._2).map { case (b, xs) => b -> xs.map(_._3).sum }
    val tgtIds = rows.filter(_._3 == "en").map(_._1).toSet
    val tgt = db.filter(t => tgtIds(t._1)).groupBy(_._2)
      .map { case (b, xs) => b -> xs.map(_._3).sum }
    val s = src.values.sum.toDouble
    val t = tgt.values.sum.toDouble
    val bd = nBuckets.toDouble
    val w = src.map { case (b, sc) =>
      val tc = tgt.getOrElse(b, 0L)
      val x = (math.log((tc + 1.0) / (t + bd)) - math.log((sc + 1.0) / (s + bd))) * 1e6
      b -> BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    db.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.map(_._3).sum, xs.map(x => x._3 * w(x._2)).sum)
    }
  }

  test("exact agreement with the driver-side recount (two bucket sizes)") {
    for (nb <- Seq(8, 1024)) {
      val got = Dsir.importanceScores(docs, col("lang") === "en", nb, 42L)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expected(nb, 42L), s"nBuckets=$nb")
    }
  }

  test("steering direction: target-vocabulary docs outscore off-target docs") {
    val got = Dsir.importanceScores(docs, col("lang") === "en", 1024, 42L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val en = Seq(1L, 2L, 5L).map(got); val fr = Seq(3L, 4L).map(got)
    assert(en.min > fr.max,
      s"en scores $en should dominate fr scores $fr")
    // the mixed doc (6: half fr, half en vocabulary) sits between
    assert(got(6L) > fr.max && got(6L) < en.max)
  }

  test("partition invariance") {
    val a = Dsir.importanceScores(docs, col("lang") === "en", 64, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val b = Dsir.importanceScores(docs.repartition(5), col("lang") === "en", 64, 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == b)
  }

  test("empty target degenerates gracefully (uniform-prior target model)") {
    val got = Dsir.importanceScores(docs, col("lang") === "xx", 64, 42L).collect()
    assert(got.length == 6)
    // with no target mass every weight is ln(1/B') - ln((sc+1)/(S+B)) — finite
    assert(got.forall(r => math.abs(r.getLong(2)) < 100000000L))
  }
}
