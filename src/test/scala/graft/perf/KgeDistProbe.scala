package graft.perf

/** Measured evidence for the distributed KGE tier (the >driverMaxParams
  * scale path a 100 TB deployment would run): trains `fitDistributed`
  * on the full sf ratings triples — forced via driverMaxParams=0 — and
  * prints per-epoch wall/CPU next to the driver tier on the same data.
  * Not part of the default bench suite; run with
  * `Test/runMain graft.perf.KgeDistProbe [model] [dim] [epochs]`. */
object KgeDistProbe {
  def main(args: Array[String]): Unit = {
    val model = args.headOption.getOrElse("transE")
    val dim = args.lift(1).map(_.toInt).getOrElse(16)
    val epochs = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val dir = sys.env.getOrElse("SFDIR", "/root/testdata/sf0.1")

    import org.apache.spark.sql.functions._
    val ratings = graft.Tables.ratings(spark, dir)
    // dense ids over the full rating graph: users ++ items, like the
    // recommenders' triple export
    val users = ratings.select(col("user_id")).distinct()
      .withColumn("h", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("user_id")) - 1)
    val nU = users.count().toInt
    val items = ratings.select(col("item_id")).distinct()
      .withColumn("t", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy("item_id")) - 1 + nU)
    val nE = nU + items.count().toInt
    val triples = ratings.join(users, "user_id").join(items, "item_id")
      .select(col("h"), (col("rating").cast("int") - 1).as("r"), col("t"))
    val nR = 5
    println(s"model=$model dim=$dim epochs=$epochs entities=$nE triples=${triples.count()}")

    def run(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      body
      println(f"$tag%-12s wall=${(System.nanoTime() - t0) / 1e9}%7.2f s cpu=${(osBean.getProcessCpuTime - c0) / 1e9}%7.2f s")
    }
    val tr = new graft.kge.KgeTrainer(model, dim, epochs, 0.1, 1.0, 42L)
    run("distributed") {
      val (ent, rel) = tr.fitEmb(spark, triples, nE, nR, driverMaxParams = 0L)
      ent.count(); rel.count()
      ent.unpersist(false); rel.unpersist(false)
    }
    run("driver") {
      val (ent, rel) = tr.fitEmb(spark, triples, nE, nR) // default: driver tier
      ent.count(); rel.count()
    }
    spark.stop()
  }
}
