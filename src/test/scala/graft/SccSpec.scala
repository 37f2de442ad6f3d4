package graft

import graft.graph.Scc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** SCC: hand-checked structures, Tarjan driver reference on a pseudo-
  * random graph, DAG-trim path, partition invariance. */
class SccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sccOf(edges: Seq[(Long, Long)], parts: Int = 4,
                    forceDistributed: Boolean = false): Map[Long, Long] =
    Scc.run(edges.toDF("s", "t").repartition(parts), "s", "t",
        maxLocalEdges = if (forceDistributed) 0L else Scc.DefaultMaxLocalEdges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Iterative Tarjan for the reference answer, scc id = min member. */
  private def tarjan(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val index = mutable.Map[Long, Int](); val low = mutable.Map[Long, Int]()
    val onStack = mutable.Set[Long](); val stack = mutable.Stack[Long]()
    var counter = 0
    val comp = mutable.Map[Long, Long]()
    def strongconnect(v0: Long): Unit = {
      // explicit work stack to avoid JVM recursion limits
      case class Frame(v: Long, var i: Int)
      val work = mutable.Stack(Frame(v0, 0))
      index(v0) = counter; low(v0) = counter; counter += 1
      stack.push(v0); onStack += v0
      while (work.nonEmpty) {
        val f = work.top
        val succ = adj.getOrElse(f.v, Seq.empty)
        if (f.i < succ.length) {
          val w = succ(f.i); f.i += 1
          if (!index.contains(w)) {
            index(w) = counter; low(w) = counter; counter += 1
            stack.push(w); onStack += w
            work.push(Frame(w, 0))
          } else if (onStack(w)) low(f.v) = math.min(low(f.v), index(w))
        } else {
          work.pop()
          if (work.nonEmpty) {
            val p = work.top.v
            low(p) = math.min(low(p), low(f.v))
          }
          if (low(f.v) == index(f.v)) {
            val members = mutable.Buffer[Long]()
            var w = stack.pop(); onStack -= w; members += w
            while (w != f.v) { w = stack.pop(); onStack -= w; members += w }
            val id = members.min
            members.foreach(m => comp(m) = id)
          }
        }
      }
    }
    nodes.foreach(v => if (!index.contains(v)) strongconnect(v))
    comp.toMap
  }

  test("two triangles joined by a one-way bridge are two components (both kernels)") {
    val e = Seq[(Long, Long)]((1, 2), (2, 3), (3, 1), (3, 10), (10, 11), (11, 12), (12, 10))
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L)
    assert(sccOf(e) == want)
    assert(sccOf(e, forceDistributed = true) == want)
  }

  test("a DAG resolves entirely to singletons (trim path)") {
    val e = (1L to 30L).sliding(2).map(p => (p(0), p(1))).toSeq ++ Seq((5L, 20L), (2L, 17L))
    val got = sccOf(e)
    assert(got.size == 30)
    assert(got.forall { case (n, id) => n == id })
  }

  test("one long cycle is one component labeled by its min node") {
    val n = 25L
    val e = (0L until n).map(i => (i, (i + 1) % n))
    val got = sccOf(e)
    assert(got.size == n)
    assert(got.values.toSet == Set(0L))
  }

  test("self-loops and isolated-in-cycle mix") {
    val e = Seq[(Long, Long)]((5, 5), (1, 5), (5, 9), (9, 1))
    // 1 -> 5 -> 9 -> 1 forms a cycle containing 5 (self-loop folded in)
    val got = sccOf(e)
    assert(got == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("NULL endpoints are dropped identically by both kernels") {
    val df = Seq((Some(1L), Some(2L)), (Some(2L), Some(1L)), (Some(3L), None: Option[Long]))
      .toDF("s", "t")
    import graft.graph.Scc
    val local = Scc.run(df, "s", "t")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Scc.run(df, "s", "t", maxLocalEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the NULL-target edge contributes nothing; 3 is not an endpoint
    // of any surviving edge and is absent (documented: nodes = edge
    // endpoints after the NULL drop)
    assert(local == Map(1L -> 1L, 2L -> 1L))
    assert(dist == local)
  }

  test("matches Tarjan on a pseudo-random 200-node graph; kernels agree; partition-invariant") {
    val edges = (0 until 600).map { i =>
      val s = (i * 2654435761L) % 200
      val t = (i * 40503L + 7) % 200
      (s, t)
    }.filter { case (s, t) => s != t }
    val want = tarjan(edges)
    assert(sccOf(edges, parts = 4) == want)                         // local kernel
    assert(sccOf(edges, parts = 11) == want)
    assert(sccOf(edges, parts = 4, forceDistributed = true) == want) // FW-BW kernel
  }
}
