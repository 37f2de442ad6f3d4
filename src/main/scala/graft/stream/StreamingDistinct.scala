package graft.stream

import graft.util.Sketches
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming DISTINCT-COUNT monitoring — the exact-integer HLL register
  * algebra ([[graft.util.Sketches]], q177/q195) lifted onto the
  * ingest-time surface: per-group (e.g. per event-type × hour window)
  * approximate unique users that refresh per trigger WITHOUT keeping
  * the raw key set in state — the question `count(approx_distinct)`
  * dashboards ask at 100 TB, where exact streaming distinct state is
  * unbounded by construction.
  *
  * Why it lifts cleanly: a group's state is its register vector
  * (idx → max rho), ≤ 2^b entries FOREVER, and registers from disjoint
  * row sets merge by per-idx max — so the streaming state after any
  * prefix of the stream is EXACTLY the batch register table over the
  * same rows, under any trigger slicing (spec-pinned) and across
  * checkpoint kill/resume. The [[StreamingQuantiles]] contract, with
  * max-merge in place of count-add.
  *
  * Hash parity: the stream computes the house md5-52 hash and
  * idx/rho split in JVM long arithmetic ([[h52Long]]/[[idxRhoLong]]),
  * spec-pinned equal to the SQL [[Sketches]] forms cell-for-cell —
  * a drift at one register would silently bias every estimate.
  */
object StreamingDistinct {

  /** One observation: group tag + the key whose distinct count is
    * monitored (NULL keys dropped upstream, matching count DISTINCT). */
  case class Obs(g: String, k: String)
  case class RegRow(g: String, idx: Long, r: Int, seq: Long)

  /** JVM twin of the SQL h52 — delegates to the single house
    * implementation ([[Sketches.h52Long]]). */
  def h52Long(seed: Long, key: String): Long = Sketches.h52Long(seed, key)

  /** JVM twin of Sketches.idxRho: idx = top b bits, rho = (w − bitlen
    * of the low w bits) + 1, capped at w+1 when they are all zero. */
  def idxRhoLong(h: Long, b: Int): (Long, Int) = {
    val w = 52 - b
    val v = h & ((1L << w) - 1)
    val rho = if (v == 0L) w + 1 else w - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1
    (h >>> w, rho)
  }

  /** Batch reference form: grouped HLL registers (g, idx, r) — the
    * exact table the streaming state must equal. idx/rho come from the
    * ONE house implementation ([[Sketches.idxRho]]); a local copy
    * would be exactly the drift site this file's header warns about. */
  def registersBatch(df: DataFrame, groupCol: String, keyCol: String,
                     b: Int, seed: Long): DataFrame = {
    require(b >= 4 && b <= 11, s"hll: b in [4, 11], got $b")
    val (idx, rho) = Sketches.idxRho(Sketches.h52(seed, Seq(col(keyCol))), b)
    df.filter(col(keyCol).isNotNull)
      .select(col(groupCol).as("g"), idx.as("idx"), rho.as("rho"))
      .groupBy("g", "idx").agg(max("rho").as("r"))
  }

  /** Stateful streaming form: per-group register map in
    * flatMapGroupsWithState; each trigger emits every updated group's
    * full register vector tagged with a state sequence number — the
    * freshest `seq` per group IS the current sketch. */
  def registersStream(obs: Dataset[Obs], b: Int, seed: Long): Dataset[RegRow] = {
    require(b >= 4 && b <= 11, s"hll: b in [4, 11], got $b")
    import obs.sparkSession.implicits._
    obs.groupByKey(_.g)
      .flatMapGroupsWithState[(Map[Long, Int], Long), RegRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[Obs], state: GroupState[(Map[Long, Int], Long)]) =>
          var (m, seq) = state.getOption.getOrElse((Map.empty[Long, Int], 0L))
          var changed = false
          it.foreach { o =>
            if (o.k != null) {
              val (idx, rho) = idxRhoLong(h52Long(seed, o.k), b)
              if (rho > m.getOrElse(idx, 0)) m = m.updated(idx, rho)
              changed = true
            }
          }
          if (!changed) Iterator.empty
          else {
            seq += 1
            state.update((m, seq))
            m.toSeq.sortBy(_._1)
              .map { case (idx, r) => RegRow(g, idx, r, seq) }.iterator
          }
      }
  }

  /** Freshest emission per group → the (g, idx, r) register table the
    * batch form produces. */
  def latestState(rows: DataFrame): DataFrame = {
    val mx = rows.groupBy("g").agg(max("seq").as("seq"))
    rows.join(mx, Seq("g", "seq")).select("g", "idx", "r")
  }

  /** Estimates from a (g, idx, r) register table: (g, m, n_zero,
    * s_scaled, est_e6) — the [[Sketches.hllEstimateGrouped]] algebra. */
  def estimates(registers: DataFrame, b: Int): DataFrame =
    Sketches.hllEstimateGrouped(registers, Seq("g"), b)
}
