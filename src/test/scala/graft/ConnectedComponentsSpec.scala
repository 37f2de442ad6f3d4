package graft

import graft.graph.ConnectedComponents
import org.apache.spark.graphx.{Edge, Graph}
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // maxLocalEdges = 0 forces the distributed loop; default gate runs
  // the driver union-find kernel on graphs this small
  private def run(edges: Seq[(Long, Long)], maxIters: Int = 50,
                  maxLocalEdges: Long = ConnectedComponents.DefaultMaxLocalEdges): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("a", "b"), "a", "b", maxIters, maxLocalEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph: chain, star, isolated pair (both kernels)") {
    // chain 1-2-3-4, star 10-{11,12,13}, pair 20-21
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L,
      10L -> 11L, 10L -> 12L, 10L -> 13L, 20L -> 21L)
    for (gate <- Seq(ConnectedComponents.DefaultMaxLocalEdges, 0L)) {
      val m = run(edges, maxLocalEdges = gate)
      assert(Seq(1L, 2L, 3L, 4L).forall(m(_) == 1L))
      assert(Seq(10L, 11L, 12L, 13L).forall(m(_) == 10L))
      assert(Seq(20L, 21L).forall(m(_) == 20L))
    }
  }

  test("edge direction and duplicates are irrelevant (both kernels)") {
    for (gate <- Seq(ConnectedComponents.DefaultMaxLocalEdges, 0L))
      assert(run(Seq(5L -> 1L, 1L -> 5L, 5L -> 1L, 9L -> 5L), maxLocalEdges = gate) ==
        Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("== GraphX connectedComponents on random graphs; local == distributed") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val edges = (1 to 400).map(_ => (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
        .filter { case (a, b) => a != b }
      val want = {
        val g = Graph.fromEdges(
          spark.sparkContext.parallelize(edges.map { case (a, b) => Edge(a, b, ()) }), ())
        g.connectedComponents().vertices.collect().toMap
      }
      assert(run(edges) == want, s"trial $trial (local kernel)")
      assert(run(edges, maxLocalEdges = 0L) == want, s"trial $trial (distributed kernel)")
    }
  }

  test("long chain: distributed converges in O(log diameter) rounds, fails past maxIters") {
    val chain = (0L until 30L).map(i => i -> (i + 1))
    // pointer jumping: 30-chain needs ~log2(30) rounds, well under 10
    val m = run(chain, maxIters = 10, maxLocalEdges = 0L)
    assert(m.values.toSet == Set(0L))
    assertThrows[IllegalArgumentException](
      run(chain, maxIters = 2, maxLocalEdges = 0L))
  }
}
