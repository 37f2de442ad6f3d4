package graft.perf

import org.apache.spark.sql.functions._

/** Scale probe for the round-10 operators (SemDeDup, PageRank,
  * connected components, heavy hitters) at 1-2 orders of magnitude
  * past the sf0.1 tables, on hash-generated synthetic inputs.
  * Run: `sbt "Test/runMain graft.perf.GraphProbe"`. */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def timed(name: String, rows: Long)(body: => Long): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"$name%-26s rows=$rows%,d out=$out%,d wall=$wall%.2fs cpu=$cpu%.1fs throughput=${rows / wall / 1e6}%.2fM rows/s")
    }

    // ---- SemDeDup: k scales with n to hold cluster size ~250, so
    // total assignment work is n*k*dim*iters = O(n^2*dim/250) — flat
    // Lloyd's inherent cost model (real SemDeDup deployments pay the
    // same n*k on GPU kmeans); one tier probes the constant factor
    for (n <- Seq(100000L, 300000L)) {
      val emb = spark.range(n).select(col("id").as("vec_id"), expr(
        """transform(sequence(0, 63),
          |  i -> cast((cast(pmod(xxhash64(id, i), 255) as int) - 127) / 127.0 as float))""".stripMargin)
        .as("embedding"))
      val k = (n / 250).toInt
      timed(s"semDedup(n=$n,k=$k)", n) {
        graft.knn.SemDeDup.semDedup(emb, "vec_id", "embedding",
          k = k, iters = 3, tau2PerTenK = 1225L)
          .filter(col("is_semdup") === 1).count()
      }
    }

    // ---- PageRank: both gate paths --------------------------------
    for ((nNodes, nEdges) <- Seq((1000000L, 5000000L), (2000000L, 5000000L))) {
      val edges = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("s"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("t"))
      val path = if (nNodes <= 1000000L) "broadcast" else "shuffle"
      timed(s"pageRank($path,V=$nNodes)", nEdges) {
        graft.graph.PageRank.run(edges, "s", "t", iters = 5).count()
      }
    }

    // ---- Connected components: supercritical random graph ---------
    locally {
      val nNodes = 1000000L; val nEdges = 1500000L
      val edges = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("a"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("b"))
      timed(s"components(V=$nNodes)", nEdges) {
        graft.graph.ConnectedComponents.run(edges, "a", "b", maxIters = 60)
          .select(countDistinct(col("component"))).collect().head.getLong(0)
      }
    }

    // ---- HITS: both gate paths, same graphs as the PageRank tiers -
    for ((nNodes, nEdges) <- Seq((1000000L, 5000000L), (2000000L, 5000000L))) {
      val edges = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("s"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("t"))
      val path = if (nNodes <= 1000000L) "broadcast" else "shuffle"
      timed(s"hits($path,V=$nNodes)", nEdges) {
        graft.graph.Hits.run(edges, "s", "t", iters = 3).count()
      }
    }

    // ---- Triangles: 5M random edges + a 100k-degree hub; the
    // degree-ordered orientation points every hub edge IN, so the
    // wedge join never fans out on the hub ------------------------
    locally {
      val nNodes = 1000000L; val nEdges = 5000000L
      val raw = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("y"))
        .union(spark.range(100000).select(lit(0L).as("x"),
          (pmod(xxhash64(col("id"), lit(2)), lit(nNodes - 1)) + 1).as("y")))
      val edges = raw.select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .filter(col("u") < col("v")).distinct()
      timed(s"triangles(V=$nNodes,hub=100k)", nEdges) {
        graft.graph.Triangles.localTriangles(edges)
          .agg(sum("tri")).collect().head.getLong(0)
      }
    }

    // ---- ItemKnn: 5M interactions, 200k users x 20k items, the
    // q123 parameterization (cap bounds the pair join) ------------
    locally {
      val n = 5000000L
      val ratings = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(200000)).as("user_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(20000)).as("item_id"),
        (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 1).cast("double").as("rating"))
      timed("itemKnn(5M,cap=50)", n) {
        graft.model.ItemKnn.recs(ratings, minRating = 4.0, cap = 50,
          minCooc = 2, kNbrs = 10, kRecs = 5).count()
      }
    }

    // ---- Coreness: 20 h-index rounds over a 5M-edge random graph
    // with a planted 100k-degree hub (the value-rollup H keeps the
    // hub's window input at |distinct neighbor values|, not deg) ----
    locally {
      val nNodes = 1000000L; val nEdges = 5000000L
      val raw = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("y"))
        .union(spark.range(100000).select(lit(0L).as("x"),
          (pmod(xxhash64(col("id"), lit(2)), lit(nNodes - 1)) + 1).as("y")))
      val edges = raw.select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .filter(col("u") < col("v")).distinct()
      timed(s"coreness(V=$nNodes,hub=100k,20r)", nEdges) {
        graft.graph.Coreness.run(edges, "u", "v", iters = 20)
          .agg(max("coreness")).collect().head.getLong(0)
      }
    }

    // ---- DenseIndex + negative sampling: 50M-row interaction table,
    // 2M-item catalog — the draw amplification is k·oversample per
    // user, never users×items ---------------------------------------
    locally {
      val n = 50000000L
      val ratings = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(5000000)).as("user_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(2000000)).as("item_id"),
        lit(5.0).as("rating"))
      timed("negatives(50M,k=4,os=3)", n) {
        graft.model.NegativeSampling.uniformNegatives(ratings, 4, 3, 7L).count()
      }
    }

    // ---- UserKnn + covisitation: the same 5M-interaction shape as
    // the itemKnn tier, PLUS a planted viral item (100k raters) that
    // the per-item cap must neutralize ------------------------------
    locally {
      val n = 5000000L
      val ratings = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(200000)).as("user_id"),
        pmod(xxhash64(col("id"), lit(1)), lit(20000)).as("item_id"),
        (pmod(xxhash64(col("id"), lit(2)), lit(5)) + 1).cast("double").as("rating"),
        pmod(xxhash64(col("id"), lit(3)), lit(2592000000L)).as("ts"))
        .union(spark.range(100000).select(
          pmod(xxhash64(col("id"), lit(4)), lit(200000)).as("user_id"),
          lit(99999L).as("item_id"), lit(5.0).as("rating"), lit(0L).as("ts")))
      timed("userKnn(5M,viral=100k)", n) {
        graft.model.UserKnn.recs(ratings, minRating = 4.0, capPerUser = 50,
          capPerItem = 50, minCooc = 2, kNbrs = 10, kRecs = 5).count()
      }
      timed("covisitation(5M,90d)", n) {
        graft.model.ItemKnn.covisitation(ratings, minRating = 4.0, cap = 50,
          windowMs = 7776000000L, minCooc = 2, k = 5).count()
      }
    }

    // ---- k-truss: the triangle tier's hub graph, 8 peel rounds ----
    locally {
      val nNodes = 1000000L; val nEdges = 5000000L
      val raw = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("y"))
        .union(spark.range(100000).select(lit(0L).as("x"),
          (pmod(xxhash64(col("id"), lit(2)), lit(nNodes - 1)) + 1).as("y")))
      val edges = raw.select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .filter(col("u") < col("v")).distinct()
      timed(s"ktruss(V=$nNodes,hub=100k,8r)", nEdges) {
        graft.graph.Truss.ktruss(edges, "u", "v", k = 4, iters = 8).count()
      }
      // full decomposition on the same hub graph: the outer peel
      // re-runs the oriented wedge per (k, round) — the stats-barrier
      // checkpoint keeps Catalyst size estimates bounded (Truss.scala)
      timed(s"trussness(V=$nNodes,hub=100k,k<=5)", nEdges) {
        graft.graph.Truss.trussness(edges, "u", "v", kMax = 5, innerIters = 4)
          .agg(max("trussness")).collect().head.getLong(0)
      }
    }

    // ---- r10 graph ops, untiered until now: LPA, HITS, link
    // prediction — same 5M-edge hub shape; the center-degree cap is
    // what keeps the link-prediction wedge from fanning deg(hub)² ---
    locally {
      val nNodes = 1000000L; val nEdges = 5000000L
      val raw = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("x"),
        pmod(xxhash64(col("id"), lit(1)), lit(nNodes)).as("y"))
        .union(spark.range(100000).select(lit(0L).as("x"),
          (pmod(xxhash64(col("id"), lit(2)), lit(nNodes - 1)) + 1).as("y")))
      val edges = raw.select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .filter(col("u") < col("v")).distinct()
      timed(s"lpa(V=$nNodes,hub=100k,5r)", nEdges) {
        graft.graph.LabelPropagation.run(edges, "u", "v", iters = 5).count()
      }
      timed(s"hits(V=$nNodes,hub=100k,5r)", nEdges) {
        graft.graph.Hits.run(edges, "u", "v", iters = 5).count()
      }
      timed(s"linkPred-RA(V=$nNodes,hub=100k)", nEdges) {
        graft.graph.LinkPrediction.resourceAllocation(edges,
          minCn = 2L, maxCenterDeg = 200L).count()
      }
    }

    // ---- Heavy hitters: 20M tokens, 1% hot over a wide tail -------
    locally {
      val n = 20000000L
      // 4 hot keys at ~5% each (> n/31) over a 2M-key tail
      val toks = spark.range(n).select(expr(
        """case when pmod(xxhash64(id), 100) < 20 then concat('hot', pmod(xxhash64(id, 2), 4))
          |     else concat('tail', pmod(xxhash64(id, 3), 2000000)) end""".stripMargin).as("w"))
      timed("heavyHitters(m=30)", n) {
        graft.util.HeavyHitters.exact(toks, "w", 30).count()
      }
    }
    spark.stop()
  }
}
