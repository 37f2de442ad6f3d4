package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION (record linkage) — Fellegi & Sunter (JASA 1969)
  * shape: deterministic BLOCKING bounds the candidate space, per-field
  * agreement scores in exact integer permille, a weighted linear match
  * score, then one-to-one TOP-1 assignment per left record. The
  * multi-field generalization of the reference's fuzzy title↔DBpedia
  * matching (`/root/reference/data_integration/dataset.py` matches on
  * normalized title + year with a WRatio tie-break — one string field,
  * one exact field, top-1; this operator is that pattern with
  * pluggable fields and weights).
  *
  * Scale shape (the dedup-family discipline): candidates come ONLY
  * from equi-joins on blocking keys (never all-pairs — each blocking
  * key is a hash-join; k keys mean k joins unioned and deduped), field
  * similarity runs only on candidates, and the final assignment is a
  * per-left-record window over that record's own candidates (bounded
  * by block co-membership). All similarity arithmetic is integer
  * permille (`div`), portable to the DuckDB oracle verbatim.
  */
object EntityResolution {

  /** Field agreement kinds. Every kind renders to integer permille. */
  sealed trait Sim
  /** 1000 on (non-null) equality, else 0. */
  case object ExactSim extends Sim
  /** Whitespace-token Jaccard of the lowercased strings, permille:
    * ⌊1000·|A∩B| / |A∪B|⌋ over distinct tokens. */
  case object TokenJaccardSim extends Sim
  /** Linear falloff for numerics: max(0, 1000 − ⌊1000·|a−b| / tol⌋). */
  final case class AbsDiffSim(tol: Long) extends Sim

  /** One compared field: output column `sim_<name>`, contributing
    * `weight · sim` to the match score. */
  final case class Field(name: String, leftCol: String, rightCol: String,
                         sim: Sim, weight: Long)

  private def tokens(c: Column): Column =
    array_distinct(filter(split(lower(c), " "), t => t =!= lit("")))

  private def simCol(f: Field): Column = f.sim match {
    case ExactSim =>
      when(col(f.leftCol) === col(f.rightCol), lit(1000L)).otherwise(lit(0L))
    case TokenJaccardSim =>
      val ta = tokens(col(f.leftCol)); val tb = tokens(col(f.rightCol))
      val ni = size(array_intersect(ta, tb)).cast("long")
      val un = (size(ta) + size(tb)).cast("long") - ni
      when(un > 0, intDiv(ni * lit(1000L), un)).otherwise(lit(0L))
    case AbsDiffSim(tol) =>
      greatest(lit(0L), lit(1000L) -
        intDiv(abs(col(f.leftCol).cast("long") - col(f.rightCol).cast("long")) * lit(1000L),
          lit(tol)))
  }

  /** Exact integer floor-division as a Column on arbitrary (positive)
    * operands: decimal division is exact, so its floor is the true
    * quotient (Spark's `/` on longs is FLOAT division; the `div`
    * operator exists only in SQL text, not the Column DSL). */
  private def intDiv(a: Column, b: Column): Column =
    floor(a.cast("decimal(20,0)") / b.cast("decimal(20,0)")).cast("long")

  /** Candidate pairs (left_id, right_id) from the union of one
    * equi-join per blocking key pair; NULL keys never pair. */
  def candidates(left: DataFrame, right: DataFrame,
                 leftId: String, rightId: String,
                 blockKeys: Seq[(Column, Column)]): DataFrame = {
    require(blockKeys.nonEmpty, "entityResolution: at least one blocking key")
    blockKeys.map { case (lk, rk) =>
      left.select(col(leftId).as("left_id"), lk.as("__bk"))
        .filter(col("__bk").isNotNull)
        .join(right.select(col(rightId).as("right_id"), rk.as("__bk"))
          .filter(col("__bk").isNotNull), Seq("__bk"))
        .select("left_id", "right_id")
    }.reduce(_ unionByName _).distinct()
  }

  /** Blocked + scored + assigned matches: one row per LEFT record that
    * has a candidate with score ≥ `minScore` — its best candidate
    * (max score, ties to min right_id), with per-field `sim_<name>`
    * permille columns and the weighted `score`. */
  def resolve(left: DataFrame, right: DataFrame,
              leftId: String, rightId: String,
              blockKeys: Seq[(Column, Column)],
              fields: Seq[Field], minScore: Long): DataFrame = {
    require(fields.nonEmpty, "entityResolution: at least one field")
    val cand = candidates(left, right, leftId, rightId, blockKeys)
    val l = fields.map(f => col(f.leftCol)).distinct
    val r = fields.map(f => col(f.rightCol)).distinct
    val scored = cand
      .join(left.select((col(leftId).as("left_id") +: l): _*), Seq("left_id"))
      .join(right.select((col(rightId).as("right_id") +: r): _*), Seq("right_id"))
      .select((col("left_id") +: col("right_id") +:
        fields.map(f => simCol(f).as(s"sim_${f.name}"))): _*)
      .withColumn("score",
        fields.map(f => col(s"sim_${f.name}") * lit(f.weight)).reduce(_ + _))
      .filter(col("score") >= minScore)
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy("left_id")
          .orderBy(col("score").desc, col("right_id").asc)))
      .filter(col("__rk") === 1).drop("__rk")
  }
}
