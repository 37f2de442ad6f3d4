package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kendall-τ rank agreement between two recommenders' lists — the
  * eval diagnostic that answers "is the expensive model actually
  * ranking differently from the popularity baseline, and where?"
  * (a high τ means the ranker adds nothing the baseline lacked;
  * Kendall 1938, the pairwise form).
  *
  * Per user, over the items BOTH rankings scored: every unordered
  * item pair is concordant when the two rankings order it the same
  * way, discordant otherwise (ranks are unique within a ranking, so
  * there are no ties) — `tau_e6 = (C − D)·10⁶ div (C + D)`, exact
  * BIGINTs (both engines truncate the possibly-negative numerator
  * toward zero identically — the q152 probe). Users with fewer than
  * two shared items have no pairs and are absent.
  *
  * Scale shape: one (user, item) equi-join to align the rankings,
  * one within-user pair self-join bounded by k(k−1)/2 (k = the
  * shorter list's length), one user-keyed aggregation.
  */
object RankAgreement {

  /** @param a,b (user_id, item_id, rank) with rank unique per user
    * @return (user_id, n_pairs, concordant, tau_e6) */
  def kendallTau(a: DataFrame, b: DataFrame): DataFrame = {
    val j = a.select(col("user_id"), col("item_id"), col("rank").as("ra"))
      .join(b.select(col("user_id"), col("item_id"), col("rank").as("rb")),
        Seq("user_id", "item_id"))
    val l = j.select(col("user_id"), col("item_id").as("ia"),
      col("ra").as("rax"), col("rb").as("rbx"))
    val r = j.select(col("user_id"), col("item_id").as("ib"),
      col("ra").as("ray"), col("rb").as("rby"))
    l.join(r, Seq("user_id"))
      .filter(col("ia") < col("ib"))
      .withColumn("conc",
        ((col("rax") < col("ray")) === (col("rbx") < col("rby"))).cast("long"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"), sum("conc").as("concordant"))
      .select(col("user_id"), col("n_pairs"), col("concordant"),
        expr("(concordant - (n_pairs - concordant)) * 1000000L div n_pairs")
          .as("tau_e6"))
  }
}
