package graft

import graft.util.Profile
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** corrMatrix: exact agreement with a driver-side Pearson computation,
  * partition invariance, zero-variance NULL semantics, pair coverage. */
class CorrMatrixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rows: Seq[(Long, Long, Long)] = (1 to 200).map { i =>
    (i.toLong, (3 * i + 7).toLong, ((i * 2654435761L) % 1000L))
  }

  private def pearsonE6(xs: Seq[Long], ys: Seq[Long]): Long = {
    val n = xs.size.toDouble
    val sx = xs.sum.toDouble; val sy = ys.sum.toDouble
    val sxx = xs.map(x => x * x).sum.toDouble
    val syy = ys.map(y => y * y).sum.toDouble
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum.toDouble
    math.round((n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) * 1e6)
  }

  test("matches driver-side Pearson on every pair and is partition-invariant") {
    val df = rows.toDF("a", "b", "c")
    val got1 = Profile.corrMatrix(df.repartition(1), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("corr_e6")).toMap
    val got7 = Profile.corrMatrix(df.repartition(7), Seq("a", "b", "c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("corr_e6")).toMap
    assert(got1 == got7)
    assert(got1.size == 3)
    val (as, bs, cs) = (rows.map(_._1), rows.map(_._2), rows.map(_._3))
    assert(got1(("a", "b")) == 1000000L)              // perfectly linear
    assert(got1(("a", "b")) == pearsonE6(as, bs))
    assert(math.abs(got1(("a", "c")) - pearsonE6(as, cs)) <= 1) // float assoc tolerance
    assert(math.abs(got1(("b", "c")) - pearsonE6(bs, cs)) <= 1)
  }

  test("zero-variance column yields NULL correlation") {
    val df = (1 to 50).map(i => (i.toLong, 7L)).toDF("x", "k")
    val r = Profile.corrMatrix(df, Seq("x", "k")).collect()(0)
    assert(r.isNullAt(r.fieldIndex("corr_e6")))
    assert(r.getAs[Long]("n") == 50L)
  }

  test("NULL rows are excluded listwise: n and moments count the same rows") {
    // without listwise exclusion, (3,NULL) inflates n while the sums
    // skip it -> corr would read negative for perfectly correlated
    // complete cases
    val df = Seq((Some(1L), Some(1L)), (Some(2L), Some(2L)), (Some(3L), None: Option[Long]))
      .toDF("x", "y")
    val r = Profile.corrMatrix(df, Seq("x", "y")).collect()(0)
    assert(r.getAs[Long]("n") == 2L)
    assert(r.getAs[Long]("corr_e6") == 1000000L)
  }

  test("anti-correlated pair hits -1e6 exactly") {
    val df = (1 to 100).map(i => (i.toLong, (1000 - 5 * i).toLong)).toDF("u", "v")
    val r = Profile.corrMatrix(df, Seq("u", "v")).collect()(0)
    assert(r.getAs[Long]("corr_e6") == -1000000L)
  }
}
