package graft.knn

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with hash-derived ±1 signs —
  * the dimensionality-reduction front end for ANN at 100 TB: project a
  * d-dim embedding column to d' ≪ d once, narrow and shuffle-free, then
  * run the cheap-distance stages (LSH banding, IVF coarse assign,
  * near-dup pre-filter) in the small space. Dense ±1 projections are
  * the database-friendly corner of Achlioptas (2003), "Database-friendly
  * random projections: Johnson–Lindenstrauss with binary coins" — no
  * Gaussian sampling, no stored matrix: sign(i, j) is re-derived from
  * the house md5 scheme wherever it's needed, so any engine (and the
  * DuckDB oracle) rebuilds the identical matrix from (d, d', seed).
  *
  * Exactness contract: components are first quantized to integer
  * micro-units (round(x·1e6), the q81 int-quantize discipline), so each
  * projected coordinate is an exact ±-signed integer SUM — no float
  * accumulation order to pin, bit-equal across engines and partition
  * orders by construction.
  *
  * Scale shape: ZERO exchanges. The sign matrix is d·d' literals baked
  * into the plan (64×16 = 1 KiB — broadcast-free), the quantize + d'
  * zip_with/aggregate folds are one narrow codegen'd projection per
  * row. At 100 TB this is a map-only pass whose output is d'/d of the
  * input width; every downstream stage shuffles the SMALL vectors.
  */
object RandomProjection {

  /** ±1 sign for matrix cell (i, j): low bit of the 52-bit house hash
    * of "i|j|seed" ([[graft.util.Sketches.h52Long]] — the single JVM
    * implementation). Odd → -1, even → +1. */
  private[graft] def sign(i: Int, j: Int, seed: Long): Long =
    if ((graft.util.Sketches.h52Long(seed, s"$i|$j") & 1L) == 1L) -1L else 1L

  /** Column j of the sign matrix as a length-d literal vector. */
  private[graft] def signColumn(d: Int, j: Int, seed: Long): Seq[Long] =
    (0 until d).map(i => sign(i, j, seed))

  /** Integer micro-unit quantization of a float/double array column:
    * round-half-away-from-zero(x·1e6) per component, as bigint —
    * spelled trunc(v ± 0.5) so it stays pure codegen arithmetic
    * (Spark's round() on doubles allocates a BigDecimal PER ELEMENT;
    * at 10M×64 that was most of the projection wall) and is exactly
    * the C round() DuckDB applies to doubles, so the oracle's
    * round(v, 0) replays it value-for-value. */
  private[graft] def quantized(embCol: Column): Column =
    transform(embCol, x => {
      val v = x.cast("double") * lit(1e6)
      when(v >= 0, v + lit(0.5)).otherwise(v - lit(0.5)).cast("long")
    })

  /** Projected coordinate j as a FLAT codegen'd expression over the
    * materialized quantized array: ±element_at sums, no higher-order
    * functions. (The first cut used aggregate(zip_with(...)) — HOFs
    * fall out of whole-stage codegen and re-evaluated the quantize
    * transform per coordinate: 249 s for 10M×64→16 on local[32].
    * The flat ± tree is pure codegen arithmetic.) */
  private def projCoord(qvec: Column, d: Int, j: Int, seed: Long): Column =
    (0 until d).map { i =>
      val e = element_at(qvec, i + 1)
      if (sign(i, j, seed) > 0L) e else -e
    }.reduce(_ + _)

  /** Wide form: id column + a d'-long `proj` array column of exact
    * integer coordinates (micro-units) — the shape downstream ANN
    * stages consume. Map-only; no exchange. */
  def projectVec(emb: DataFrame, dProj: Int, seed: Long,
                 embCol: String = "embedding",
                 idCol: String = "vec_id"): DataFrame = {
    require(dProj > 0, "randomProjection: dProj > 0")
    val first = emb.select(size(col(embCol))).limit(1).collect()
    require(first.nonEmpty, "randomProjection: empty input")
    val d = first(0).getInt(0)
    require(d > 0, "randomProjection: empty embedding column")
    // d comes from one sampled row; a RAGGED column would otherwise be
    // silently truncated (longer rows) or die on a bare ANSI index
    // error (shorter rows) — gate the quantized array through a
    // per-row length check so the failure is loud and NAMED, at zero
    // extra passes
    val q = when(size(col(embCol)) === lit(d), quantized(col(embCol)))
      .otherwise(raise_error(
        lit(s"randomProjection: ragged embedding column (expected length $d)"))
        .cast("array<bigint>"))
    emb.select(col(idCol), q.as("__q"))
      .select(col(idCol),
        array((0 until dProj).map(j => projCoord(col("__q"), d, j, seed)): _*).as("proj"))
  }

  /** Tidy form for oracles and sinks: one row per (id, dim) with the
    * exact integer coordinate `p`. Same map-only plan + one generator. */
  def project(emb: DataFrame, dProj: Int, seed: Long,
              embCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame =
    projectVec(emb, dProj, seed, embCol, idCol)
      .select(col(idCol), posexplode(col("proj")).as(Seq("dim", "p")))
}
