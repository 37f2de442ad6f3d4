package graft

import graft.model.Rrf
import org.scalatest.funsuite.AnyFunSuite

class RrfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Long, Long, Int)*) = rows.toDF("user_id", "item_id", "rank")

  private def fuse(rs: Seq[org.apache.spark.sql.DataFrame], topK: Int = 5): Seq[(Long, Long, Long, Int)] =
    Rrf.fuse(rs, 60L, topK).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .sortBy(t => (t._1, t._4))

  test("hand-computed fusion of two rankings") {
    val a = df((1L, 10L, 1), (1L, 20L, 2))
    val b = df((1L, 20L, 1), (1L, 30L, 2))
    val out = fuse(Seq(a, b))
    val c61 = 1000000L / 61; val c62 = 1000000L / 62
    assert(out == Seq(
      (1L, 20L, c61 + c62, 1), // in both rankings
      (1L, 10L, c61, 2),
      (1L, 30L, c62, 3)))
  }

  test("equal fused scores break by item id") {
    val out = fuse(Seq(df((1L, 9L, 1)), df((1L, 5L, 1))))
    assert(out.map(t => (t._2, t._4)) == Seq((5L, 1), (9L, 2)))
  }

  test("topK truncates") {
    val a = df((1 to 10).map(i => (1L, i.toLong, i)): _*)
    assert(fuse(Seq(a), topK = 3).map(_._2) == Seq(1L, 2L, 3L))
  }

  test("single-ranking fusion preserves the order") {
    val a = df((1L, 7L, 1), (1L, 3L, 2), (1L, 9L, 3))
    assert(fuse(Seq(a)).map(_._2) == Seq(7L, 3L, 9L))
  }

  test("users fuse independently") {
    val a = df((1L, 10L, 1), (2L, 20L, 1))
    val out = fuse(Seq(a))
    assert(out == Seq((1L, 10L, 1000000L / 61, 1), (2L, 20L, 1000000L / 61, 1)))
  }

  test("guards") {
    intercept[IllegalArgumentException](Rrf.fuse(Seq.empty))
    intercept[IllegalArgumentException](Rrf.fuse(Seq(df((1L, 1L, 1))), k = 0))
  }
}
