package graft.knn

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding prototypes over int8 codes, in EXACT integer
  * arithmetic: centroid = floor of the per-dimension mean (the
  * [[SemDeDup]] centroid-update rule applied to labeled groups), plus
  * per-group tightness = squared-L2 spread around the own-group
  * prototype. The class-prototype / cluster-health readout of an
  * embedding table: drifting or collapsing classes show up as
  * prototype shifts and spread inflation long before a model eval
  * does.
  *
  * Physical plan: the centroid build is a posexplode into skinny
  * (group, dim) partial sums (map-side combined — at most
  * groups x dim x partitions rows move); the spread pass joins the
  * groups-sized prototype table back by BROADCAST (the corpus never
  * shuffles) and aggregates d2 with map-side combine. Two corpus
  * scans, zero corpus exchanges.
  */
object Prototypes {

  /** (group, n_vecs, sum_d2, mean_d2_e2) — one row per distinct value
    * of `groupCol`; `codes` needs an int-array `qvec` column (see
    * [[Quantize.int8]]). mean_d2_e2 = (sum_d2 * 100) div n_vecs. */
  def tightness(codes: DataFrame, groupCol: String): DataFrame = {
    val cents = codes
      .select(col(groupCol).as("g"), posexplode(col("qvec")).as(Seq("d", "q")))
      .groupBy("g", "d")
      .agg(floor(sum(col("q").cast("long")).cast("double") / count(lit(1)))
        .cast("long").as("cv"))
      .groupBy("g")
      // ascending-dim order restored after the shuffle
      .agg(array_sort(collect_list(struct(col("d"), col("cv")))).as("cs"))
      .select(col("g"), expr("transform(cs, x -> x.cv)").as("cvec"))
    codes
      .join(broadcast(cents), col(groupCol) === col("g"))
      .select(col("g"), expr(
        """aggregate(zip_with(qvec, cvec, (q, c) -> (cast(q as bigint) - c) * (cast(q as bigint) - c)),
          |          cast(0 as bigint), (a, x) -> a + x)""".stripMargin).as("d2"))
      .groupBy(col("g").as("group"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2")).as("sum_d2"))
      .withColumn("mean_d2_e2", expr("(sum_d2 * 100) div n_vecs"))
  }
}
