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

  /** NULL-propagating composite blocking key: NULL when ANY component
    * is NULL — a bare `concat_ws` SKIPS null args, silently degrading
    * a composite to a partial key that pairs rows an AND-equality
    * oracle join rejects (the [[candidates]] "NULL keys never pair"
    * contract must hold for composites too). Components join on
    * U+0001, a separator that cannot appear in normal field text, so
    * ("a|b","c") and ("a","b|c") render distinct keys. */
  def compositeKey(cols: Column*): Column = {
    require(cols.nonEmpty, "compositeKey: at least one component")
    when(cols.map(_.isNotNull).reduce(_ && _), concat_ws("\u0001", cols: _*))
  }

  /** Per-field agreement column. Token-Jaccard reads PRE-TOKENIZED
    * array columns (`__lt_/__rt_<name>`, built once per RECORD before
    * the candidate join in [[scoredPairs]]) — tokenizing inside the
    * pair expression would re-split both strings once per candidate
    * PAIR, a per-record-vs-per-pair cost gap that grows with block
    * size. */
  private def simCol(f: Field): Column = f.sim match {
    case ExactSim =>
      when(col(f.leftCol) === col(f.rightCol), lit(1000L)).otherwise(lit(0L))
    case TokenJaccardSim =>
      val ta = col(s"__lt_${f.name}"); val tb = col(s"__rt_${f.name}")
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

  /** BLOCKING-QUALITY ADVISOR (the standard record-linkage blocking
    * metrics — Christen, "Data Matching", 2012, ch. 7): the pre-flight
    * a resolution job runs BEFORE the candidate join, because a
    * low-cardinality blocking key has CONSTANT block count, so blocks
    * grow linearly with the table and candidate pairs quadratically —
    * the r13 q200 incident (a bare-brand key: 116 s at sf0.1, 14.6 s
    * after compositing, truth unchanged). One row per blocking key:
    *
    *  - `n_blocks`           blocks present on BOTH sides (only those
    *                         generate pairs)
    *  - `cand_pairs`         Σ_blocks |L_b|·|R_b| — the key's raw
    *                         candidate volume (pre-dedup across keys)
    *  - `max_block_pairs`    the largest single block's pair count
    *                         (the straggler task, the q198 keySkew
    *                         question asked of blocks)
    *  - `reduction_permille` ⌊1000·(1 − cand_pairs/(|L|·|R|))⌋ — how
    *                         much of the cross product the key prunes
    *  - `quadratic_flag`     1 iff cand_pairs > quadraticFactor·(|L|+|R|)
    *                         — candidate volume super-linear in table
    *                         size; composite the key
    *  - `truth_pairs` / `truth_covered` / `pc_permille` — pairs
    *    completeness against an optional ground-truth pair table
    *    (columns `left_id`, `right_id`): the fraction of true matches
    *    the key's blocks can still see. NULL when no truth is given.
    *
    * All arithmetic exact integers (decimal floor-division), one
    * grouped count per key side — the corpus never joins, only the
    * skinny block rollups do; the optional truth pass is one
    * candidates-∩-truth semi-join per key. */
  def blockingStats(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String,
                    blockKeys: Seq[(Column, Column)],
                    truth: Option[DataFrame] = None,
                    quadraticFactor: Long = 16L): DataFrame = {
    require(blockKeys.nonEmpty, "blockingStats: at least one blocking key")
    val nL = left.count()
    val nR = right.count()
    require(nL > 0 && nR > 0, "blockingStats: both sides must be non-empty")
    val truthPairs = truth.map(_.select(col("left_id"), col("right_id")).distinct())
    val nTruth = truthPairs.map(_.count())
    def intDiv38(a: Column, b: Column): Column =
      floor(a.cast("decimal(38,0)") / b.cast("decimal(38,0)")).cast("long")
    val perKey = blockKeys.zipWithIndex.map { case ((lk, rk), i) =>
      val lb = left.select(lk.as("__bk")).filter(col("__bk").isNotNull)
        .groupBy("__bk").agg(count(lit(1)).as("nl"))
      val rb = right.select(rk.as("__bk")).filter(col("__bk").isNotNull)
        .groupBy("__bk").agg(count(lit(1)).as("nr"))
      val agg = lb.join(rb, Seq("__bk"))
        .agg(count(lit(1)).as("n_blocks"),
          coalesce(sum(col("nl") * col("nr")), lit(0L)).as("cand_pairs"),
          coalesce(max(col("nl") * col("nr")), lit(0L)).as("max_block_pairs"))
      val withTruth = truthPairs match {
        case Some(t) =>
          val cov = candidates(left, right, leftId, rightId, Seq((lk, rk)))
            .join(t, Seq("left_id", "right_id"), "left_semi")
            .agg(count(lit(1)).as("truth_covered"))
          agg.crossJoin(broadcast(cov))
            .withColumn("truth_pairs", lit(nTruth.get))
        case None =>
          agg.withColumn("truth_covered", lit(null).cast("long"))
            .withColumn("truth_pairs", lit(null).cast("long"))
      }
      withTruth.withColumn("key_idx", lit(i.toLong))
    }
    perKey.reduce(_ unionByName _)
      .select(col("key_idx"), col("n_blocks"), col("cand_pairs"),
        col("max_block_pairs"),
        (lit(1000L) - intDiv38(lit(1000L) * col("cand_pairs"),
          lit(nL) * lit(nR))).as("reduction_permille"),
        when(col("cand_pairs") > lit(quadraticFactor) * lit(nL + nR), lit(1L))
          .otherwise(lit(0L)).as("quadratic_flag"),
        col("truth_pairs"), col("truth_covered"),
        when(col("truth_pairs") > 0,
          intDiv38(lit(1000L) * col("truth_covered"), col("truth_pairs")))
          .as("pc_permille"))
  }

  /** [[blockingStats]]-backed guard used by [[resolve]] /
    * [[resolveUnique]] when `adviseBlocking` is set: logs one warning
    * per quadratic blocking key. A warning, not a failure — the
    * caller may knowingly accept a small quadratic key. */
  private def warnQuadraticKeys(left: DataFrame, right: DataFrame,
                                leftId: String, rightId: String,
                                blockKeys: Seq[(Column, Column)]): Unit = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    blockingStats(left, right, leftId, rightId, blockKeys)
      .filter(col("quadratic_flag") === 1L)
      .select("key_idx", "cand_pairs", "reduction_permille")
      .collect()
      .foreach(r => log.warn(
        s"entityResolution: blocking key #${r.getLong(0)} generates " +
          s"${r.getLong(1)} candidate pairs (reduction ${r.getLong(2)} " +
          "permille) — super-linear in table size; composite the key " +
          "(see EntityResolution.blockingStats)"))
  }

  /** Blocked candidates with per-field `sim_<name>` permille columns
    * and the weighted `score`, thresholded at `minScore` — the shared
    * scoring stage of [[resolve]] / [[resolveUnique]]. */
  def scoredPairs(left: DataFrame, right: DataFrame,
                  leftId: String, rightId: String,
                  blockKeys: Seq[(Column, Column)],
                  fields: Seq[Field], minScore: Long): DataFrame = {
    require(fields.nonEmpty, "entityResolution: at least one field")
    val cand = candidates(left, right, leftId, rightId, blockKeys)
    val l = fields.map(f => col(f.leftCol)).distinct
    val r = fields.map(f => col(f.rightCol)).distinct
    // tokenize string fields ONCE per record (see simCol) — the
    // projected sides stay skinny: id + compared fields + token arrays
    val jac = fields.filter(_.sim == TokenJaccardSim)
    val lSide = jac.foldLeft(left.select((col(leftId).as("left_id") +: l): _*))(
      (df, f) => df.withColumn(s"__lt_${f.name}", tokens(col(f.leftCol))))
    val rSide = jac.foldLeft(right.select((col(rightId).as("right_id") +: r): _*))(
      (df, f) => df.withColumn(s"__rt_${f.name}", tokens(col(f.rightCol))))
    cand
      .join(lSide, Seq("left_id"))
      .join(rSide, Seq("right_id"))
      .select((col("left_id") +: col("right_id") +:
        fields.map(f => simCol(f).as(s"sim_${f.name}"))): _*)
      .withColumn("score",
        fields.map(f => col(s"sim_${f.name}") * lit(f.weight)).reduce(_ + _))
      .filter(col("score") >= minScore)
  }

  /** Blocked + scored + assigned matches: one row per LEFT record that
    * has a candidate with score ≥ `minScore` — its best candidate
    * (max score, ties to min right_id), with per-field `sim_<name>`
    * permille columns and the weighted `score`. Many lefts may share
    * one right; see [[resolveUnique]] for the one-to-one form. */
  def resolve(left: DataFrame, right: DataFrame,
              leftId: String, rightId: String,
              blockKeys: Seq[(Column, Column)],
              fields: Seq[Field], minScore: Long,
              adviseBlocking: Boolean = false): DataFrame = {
    if (adviseBlocking) warnQuadraticKeys(left, right, leftId, rightId, blockKeys)
    bestPerLeft(scoredPairs(left, right, leftId, rightId, blockKeys, fields, minScore))
  }

  /** The [[resolve]] assignment step alone — best candidate per left
    * (max score, ties to min right_id) over an already-scored pair
    * table. Split out so callers sharing one scored materialization
    * between [[resolve]] and [[assignUnique]] (q200/q202) don't
    * rebuild the scoring chain. */
  def bestPerLeft(scored: DataFrame): DataFrame =
    scored
      .withColumn("__rk", row_number().over(
        Window.partitionBy("left_id")
          .orderBy(col("score").desc, col("right_id").asc)))
      .filter(col("__rk") === 1).drop("__rk")

  /** ONE-TO-ONE assignment over a scored pair table: `rounds` rounds
    * of LOCALLY-DOMINANT matching (Manne–Bisseling parallel greedy) —
    * a pair is matched in a round iff it is BOTH its left's best and
    * its right's best surviving candidate under the total order
    * (score DESC, partner id ASC); matched endpoints leave the pool.
    * With a total order this reproduces sequential best-first greedy
    * matching, round count bounded by the longest preference chain —
    * and because the round count is FIXED, the whole procedure is a
    * deterministic unrollable recurrence (the fixed-iteration
    * [[graft.graph.PageRank]] discipline) that an oracle replays as
    * `rounds` chained SQL stages. Pairs still unmatched after
    * `rounds` rounds stay unmatched (documented cutoff, loud in the
    * spec; realistic blocking graphs converge in ≤ 4).
    *
    * Physical shape per round: two per-key row_number windows
    * (bounded by per-key candidate counts, never global) + two
    * anti-joins. No collect, no driver loop over data. */
  /** Size gate for [[assignUnique]]: at or below this many scored
    * pairs the round recurrence runs on the driver over the collected
    * pair list — the SAME rounds-of-dominance semantics (bit-equal by
    * construction, spec-pinned), with zero per-round job overhead (the
    * [[graft.graph.Scc]] dispatch discipline). 2M pairs ≈ 48 MB. */
  val MaxLocalPairs = 2000000L

  def assignUnique(scored: DataFrame, rounds: Int = 8,
                   maxLocalPairs: Long = MaxLocalPairs): DataFrame = {
    require(rounds >= 1 && rounds <= 32, s"assignUnique: rounds in [1,32], got $rounds")
    import org.apache.spark.storage.StorageLevel
    // distinct: duplicate rows would otherwise make the kernels
    // diverge (the local kernel's structural best-pair equality emits
    // both copies; the distributed row_number keeps one) and break
    // one-to-one; duplicate (left,right) at DIFFERENT scores remain as
    // parallel edges, handled identically by both kernels
    var cand = scored.select("left_id", "right_id", "score").distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (cand.count() <= maxLocalPairs) {
      val out = assignUniqueLocal(cand, rounds)
      cand.unpersist(blocking = false)
      return out
    }
    var matched: DataFrame = null
    var r = 0
    var done = false
    while (r < rounds && !done) {
      val bl = cand.withColumn("__bl", row_number().over(
        Window.partitionBy("left_id").orderBy(col("score").desc, col("right_id").asc)))
      val dom = bl.withColumn("__br", row_number().over(
          Window.partitionBy("right_id").orderBy(col("score").desc, col("left_id").asc)))
        .filter(col("__bl") === 1 && col("__br") === 1)
        .select("left_id", "right_id", "score")
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (dom.limit(1).count() == 0) { dom.unpersist(blocking = false); done = true }
      else {
        // eager localCheckpoint bakes dom's rows into the accumulated
        // matches (the Scc.addOut discipline), so dom and the previous
        // union can be unpersisted immediately — no per-round cache
        // accretion on the scale path
        matched = (if (matched == null) dom else matched.union(dom))
          .localCheckpoint(true)
        val next = cand
          .join(dom.select(col("left_id")), Seq("left_id"), "left_anti")
          .join(dom.select(col("right_id")), Seq("right_id"), "left_anti")
          .select("left_id", "right_id", "score")
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        dom.unpersist(blocking = false)
        cand.unpersist(blocking = false)
        cand = next
      }
      r += 1
    }
    cand.unpersist(blocking = false)
    if (matched == null) cand.limit(0)
    else matched.select("left_id", "right_id", "score")
  }

  /** Driver kernel: the identical round recurrence over the collected
    * pair array. Per round: best-per-left and best-per-right under
    * (score DESC, partner ASC) in two hash-map sweeps; pairs best for
    * both match and their endpoints leave the pool. */
  private def assignUniqueLocal(cand: DataFrame, rounds: Int): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    var pool = cand.as[(Long, Long, Long)].collect()
    val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Long)]()
    var r = 0
    var done = false
    while (r < rounds && !done && pool.nonEmpty) {
      // best candidate per endpoint under (score DESC, partner ASC)
      def better(a: (Long, Long, Long), b: (Long, Long, Long), partnerOfA: Long, partnerOfB: Long): Boolean =
        a._3 > b._3 || (a._3 == b._3 && partnerOfA < partnerOfB)
      val bestL = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      val bestR = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
      pool.foreach { p =>
        val bl = bestL.get(p._1)
        if (bl.isEmpty || better(p, bl.get, p._2, bl.get._2)) bestL(p._1) = p
        val br = bestR.get(p._2)
        if (br.isEmpty || better(p, br.get, p._1, br.get._1)) bestR(p._2) = p
      }
      val dom = pool.filter(p => bestL(p._1) == p && bestR(p._2) == p)
      if (dom.isEmpty) done = true
      else {
        out ++= dom
        val usedL = dom.map(_._1).toSet
        val usedR = dom.map(_._2).toSet
        pool = pool.filterNot(p => usedL(p._1) || usedR(p._2))
      }
      r += 1
    }
    out.toSeq.toDF("left_id", "right_id", "score")
  }

  /** [[resolve]]'s one-to-one sibling: blocked scoring +
    * [[assignUnique]]; each right record is awarded to at most one
    * left record. */
  def resolveUnique(left: DataFrame, right: DataFrame,
                    leftId: String, rightId: String,
                    blockKeys: Seq[(Column, Column)],
                    fields: Seq[Field], minScore: Long,
                    rounds: Int = 8,
                    maxLocalPairs: Long = MaxLocalPairs,
                    adviseBlocking: Boolean = false): DataFrame = {
    if (adviseBlocking) warnQuadraticKeys(left, right, leftId, rightId, blockKeys)
    assignUnique(
      scoredPairs(left, right, leftId, rightId, blockKeys, fields, minScore),
      rounds, maxLocalPairs)
  }
}
