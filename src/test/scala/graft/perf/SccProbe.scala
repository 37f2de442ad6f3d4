package graft.perf

import graft.graph.Scc
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distributed-kernel SCC probe: `runMain graft.perf.SccProbe [nCycles]`.
  *
  * Graph (the bow-tie envelope the kernel is designed for): `nCycles`
  * (default 250k) disjoint 16-node directed cycles (4M cycle edges) +
  * 1M cross edges ONLY from the first 100 "hub" cycles into uniform
  * higher cycles — a condensation DAG of depth 2, so the outer loop
  * resolves in ~2-3 rounds (see the complexity envelope in
  * [[graft.graph.Scc]]'s scaladoc: rounds track the condensation
  * CHAIN depth, which web-scale bow-ties keep shallow). 5M edges,
  * 4M nodes, 250k SCCs of 16. Forces the FW-BW-Trim kernel
  * (maxLocalEdges = 0); the local Tarjan wall on the same graph
  * prints for comparison.
  */
object SccProbe {
  def main(args: Array[String]): Unit = {
    val nCycles = args.headOption.map(_.toLong).getOrElse(250000L)
    require(nCycles > 200, "probe assumes > 200 cycles")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val cyc = spark.range(0L, nCycles * 16)
      .selectExpr("id as s",
        "(id div 16) * 16 + (id + 1) % 16 as t")
    val cross = spark.range(0L, nCycles * 4)
      .selectExpr(
        // hub layer: cycles 0..99 fan out to strictly higher cycles
        "(id % 100) * 16 + (id * 2654435761) % 16 as s",
        s"(100 + (id * 40503) % (${nCycles} - 100)) * 16 + (id * 668265263) % 16 as t")
    val edges = cyc.union(cross)
    edges.persist(); timed("edges materialize")(println("  m = " + edges.count()))
    timed("SCC distributed (FW-BW-Trim)") {
      val r = Scc.run(edges, "s", "t", maxLocalEdges = 0L).persist()
      println("  components = " + r.select(countDistinct("scc_id")).collect()(0).getLong(0)
        + ", nodes = " + r.count())
      r.unpersist(blocking = false)
    }
    timed("SCC local (Tarjan) same graph") {
      val r = Scc.run(edges, "s", "t", maxLocalEdges = Long.MaxValue).persist()
      println("  components = " + r.select(countDistinct("scc_id")).collect()(0).getLong(0))
      r.unpersist(blocking = false)
    }
    spark.stop()
  }
}
