package graft

import graft.knn.{CosineKnn, Quantize}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def randVecs(n: Int, d: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(d)(rnd.nextGaussian()))).toDF("id", "vec")
  }

  test("quantization: tinyint storage, max element hits ±127, zero vector safe") {
    val df = Seq(
      (1L, Array(0.5, -1.0, 0.25, 0.0)),
      (2L, Array(0.0, 0.0, 0.0, 0.0))).toDF("id", "vec")
    val q = Quantize.int8Compact(df)
    assert(q.schema("qvec").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType, true))
    val rows = q.collect().map(r => r.getLong(0) ->
      ((r.getDouble(1), r.getSeq[Byte](2).toArray))).toMap
    assert(rows(1L)._2.toSeq == Seq[Byte](64, -127, 32, 0), s"q1=${rows(1L)._2.toSeq}")
    assert(rows(1L)._1 == 1.0 / 127.0)
    assert(rows(2L) == ((1.0, Array[Byte](0, 0, 0, 0))).copy(_2 = rows(2L)._2)
      && rows(2L)._2.forall(_ == 0) && rows(2L)._1 == 1.0)
  }

  test("quantized cosine tracks exact cosine within int8 resolution") {
    val df = randVecs(60, 64, 7)
    val exact = CosineKnn.topK(df, df, 60, excludeSelf = true)
      .select("query_id", "item_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quant = Quantize.cosTopK(df, df, 60, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val errs = exact.keys.map(k => math.abs(exact(k) - quant(k)))
    assert(errs.max < 0.02, s"max |cos - qcos| = ${errs.max}")
  }

  test("recall@3 vs the exact kernel stays high; zero vectors rank last") {
    val df = randVecs(80, 64, 11)
      .union(Seq((999L, Array.fill(64)(0.0))).toDF("id", "vec"))
    val exact = CosineKnn.topK(df, df, 3, excludeSelf = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val quant = Quantize.cosTopK(df, df, 3, excludeSelf = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val qByQ = quant.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val overlap = exact.keys.toSeq.map(q =>
      (exact(q) intersect qByQ(q)).size.toDouble / 3.0)
    val recall = overlap.sum / overlap.size
    info(f"recall@3 of int8 vs exact: $recall%.3f")
    assert(recall >= 0.85, f"recall $recall%.3f")
    // the zero vector never appears as a neighbor (sentinel ranks last)
    assert(!quant.exists(x => x._2 == 999L && x._3 > -2.0))
  }
}
