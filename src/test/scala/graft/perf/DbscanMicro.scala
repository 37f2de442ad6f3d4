package graft.perf

import graft.knn.{Dbscan, RandomProjection}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of q219 (grid DBSCAN) at bench scale:
  * `Test/runMain graft.perf.DbscanMicro [sfDir]` — prints candidate
  * volume, core count, core-edge count and per-phase walls so the
  * wall-vs-CPU gap (11.7 s wall / 21 CPU-s on 2,000 points in the r14
  * mid bench) is attributed to a phase, not guessed. */
object DbscanMicro {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
    }
    val emb = graft.Tables.t(spark, dir, "embeddings")
    val dim = 2; val eps = 150000L; val minPts = 5
    val proj = timed("project") {
      RandomProjection.projectVec(emb, dim, 42L, "embedding", "vec_id")
        .select(col("vec_id") +: (0 until dim).map(i =>
          element_at(col("proj"), i + 1).as(s"p$i")): _*)
        .localCheckpoint(true)
    }
    println(s"  n=${proj.count()}")
    // replicate Dbscan.cluster phases
    val base = proj.select(col("vec_id").as("id"), col("p0").cast("long").as("x0"),
      col("p1").cast("long").as("x1"))
    import graft.knn.Dbscan.floorCell
    val offsets = for (a <- Seq(-1L, 0L, 1L); b <- Seq(-1L, 0L, 1L)) yield (a, b)
    val lhs = base.select(col("id").as("a_id"), col("x0").as("ax0"), col("x1").as("ax1"),
      explode(array(offsets.map { case (a, b) => struct(
        (floorCell(col("x0"), eps) + lit(a)).as("c0"),
        (floorCell(col("x1"), eps) + lit(b)).as("c1")) }: _*)).as("cell"))
      .select(col("a_id"), col("ax0"), col("ax1"), col("cell.*"))
    val rhs = base.select(col("id").as("b_id"), col("x0").as("bx0"), col("x1").as("bx1"),
      floorCell(col("x0"), eps).as("c0"), floorCell(col("x1"), eps).as("c1"))
    val d2 = (col("ax0") - col("bx0")) * (col("ax0") - col("bx0")) +
      (col("ax1") - col("bx1")) * (col("ax1") - col("bx1"))
    val pairs = timed("pairs join+ckpt") {
      lhs.join(rhs, Seq("c0", "c1")).filter(d2 <= lit(eps * eps))
        .select(col("a_id"), col("b_id")).localCheckpoint(true)
    }
    println(s"  candidate pairs=${pairs.count()}")
    val core = timed("core counts") {
      pairs.groupBy("a_id").agg(count(lit(1)).as("n_nb"))
        .filter(col("n_nb") >= minPts).select(col("a_id").as("id"))
        .localCheckpoint(true)
    }
    println(s"  cores=${core.count()}")
    val coreEdges = timed("core edges") {
      pairs.join(core.select(col("id").as("a_id")), "a_id")
        .join(core.select(col("id").as("b_id")), "b_id")
        .select("a_id", "b_id").localCheckpoint(true)
    }
    println(s"  core edges=${coreEdges.count()}")
    timed("cc") {
      graft.graph.ConnectedComponents.run(coreEdges, "a_id", "b_id").count()
    }
    timed("full cluster() e2e") {
      Dbscan.cluster(base.select(col("id").as("vec_id"), col("x0"), col("x1")),
        Seq("x0", "x1"), eps, minPts).count()
    }
    spark.stop()
  }
}
