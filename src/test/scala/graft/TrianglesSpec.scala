package graft

import graft.graph.Triangles
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

class TrianglesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def edges(es: (Int, Int)*): DataFrame =
    es.map { case (u, v) => (u.toLong, v.toLong) }.toDF("u", "v")

  private def run(df: DataFrame): Map[Long, (Long, Long, Long)] =
    Triangles.localTriangles(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("triangle with a pendant: counts and scaled coefficients by hand") {
    val got = run(edges((1, 2), (1, 3), (2, 3), (3, 4)))
    // node 3 has deg 3, 1 triangle: cc = 2*1*1e4 div (3*2) = 3333
    assert(got == Map(
      1L -> ((2L, 1L, 10000L)), 2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 1L, 3333L)), 4L -> ((1L, 0L, 0L))))
  }

  test("two triangles sharing an edge (K4 minus one edge)") {
    val got = run(edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4)))
    assert(got == Map(
      1L -> ((3L, 2L, 6666L)), 2L -> ((3L, 2L, 6666L)),
      3L -> ((2L, 1L, 10000L)), 4L -> ((2L, 1L, 10000L))))
  }

  test("K5: every node in C(4,2)=6 triangles, coefficient exactly 1") {
    val k5 = for (u <- 1 to 5; v <- (u + 1) to 5) yield (u, v)
    val got = run(edges(k5: _*))
    assert(got.values.toSet == Set((4L, 6L, 10000L)))
    assert(got.values.map(_._2).sum == 30L) // 10 triangles x 3 nodes
  }

  test("bipartite graph has zero triangles; star hub oriented without fan-out blowup") {
    val bip = run(edges((1, 10), (1, 11), (2, 10), (2, 11), (3, 10)))
    assert(bip.values.forall(_._2 == 0L))
    val star = run(edges((1 to 40).map(i => (0, i * 100)): _*))
    assert(star(0L) == ((40L, 0L, 0L)))
  }

  test("== naive unordered triple-join count on a random graph, partitioning invariant") {
    val rnd = new scala.util.Random(11)
    val es = (1 to 400).map(_ => (rnd.nextInt(40), rnd.nextInt(40)))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b).toLong, math.max(a, b).toLong) }
      .distinct
    val df = es.toDF("u", "v")
    df.createOrReplaceTempView("tri_e")
    val naiveTotal = spark.sql(
      """SELECT count(*) FROM tri_e e1
        |JOIN tri_e e2 ON e2.u = e1.u AND e2.v > e1.v
        |JOIN tri_e e3 ON e3.u = e1.v AND e3.v = e2.v""".stripMargin)
      .collect().head.getLong(0)
    // naive per-node: triangles containing n
    val naivePerNode = spark.sql(
      """SELECT node, count(*) AS t FROM (
        |  SELECT e1.u AS a, e1.v AS b, e2.v AS c FROM tri_e e1
        |  JOIN tri_e e2 ON e2.u = e1.u AND e2.v > e1.v
        |  JOIN tri_e e3 ON e3.u = e1.v AND e3.v = e2.v)
        |LATERAL VIEW explode(array(a, b, c)) AS node GROUP BY node""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 5)) {
      val got = run(df.repartition(parts))
      assert(got.values.map(_._2).sum == naiveTotal * 3, s"parts=$parts")
      assert(got.filter(_._2._2 > 0).map { case (n, v) => n -> v._2 } == naivePerNode,
        s"parts=$parts")
    }
  }
}
