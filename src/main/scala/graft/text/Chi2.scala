package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** χ² feature selection over (term presence × document class) — the
  * standard pick of class-discriminative vocabulary (Yang & Pedersen
  * 1997) used to build lightweight quality / domain classifiers over a
  * corpus (the fastText-recipe front end: select k terms per class,
  * then train on the reduced vocabulary).
  *
  * Exactness: the 2×2 contingency per (term, class) is built from
  * EXACT integer document counts (a = docs of class c containing t,
  * plus the T/C/N marginals); χ² = N(ad−bc)² / (T(N−T)C(N−C)) is then
  * ONE pinned float expression over those integers, rounded ONCE to
  * e6, and ranking is on the rounded value with a term tiebreak (the
  * q217 discipline) — so the oracle replays the ranking exactly.
  *
  * Scale shape: one distinct-(doc, term) explode (bounded by corpus
  * token volume), one (term, class) count, a vocab-sized term-marginal
  * join, and BROADCAST joins for the |classes|-row and 1-row
  * marginals. The per-class top-k window partitions by class over
  * df-floored terms only — never the raw vocabulary.
  */
object Chi2 {

  /** Top-k terms per class by χ² (presence contingency, e6-rounded,
    * term-tiebroken). Tokens: lowercase, single-space split, distinct
    * per doc, empties dropped. Terms seen in fewer than `minDf` docs
    * are excluded (noise floor AND the window-size bound); terms in
    * EVERY doc have an undefined χ² (zero marginal) and are excluded
    * by both engines. Output: (class, term, n_both, term_df, chi2_e6,
    * rk). */
  def topTermsByClass(docs: DataFrame, classCol: String, k: Int,
                      minDf: Long = 5L, textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, "chi2: k >= 1")
    require(minDf >= 1L, "chi2: minDf >= 1")
    val base = docs.filter(col(textCol).isNotNull && col(classCol).isNotNull)
      .select(col(idCol).as("doc"), col(classCol).as("cls"), col(textCol).as("text"))
    val terms = base.select(col("doc"), col("cls"),
        explode(array_distinct(split(lower(col("text")), " "))).as("term"))
      .filter(col("term") =!= "")
    val n = base.select(countDistinct(col("doc")).as("n_total"))
    val cCnt = base.groupBy("cls").agg(countDistinct(col("doc")).as("n_cls"))
    val tCnt = terms.groupBy("term").agg(countDistinct(col("doc")).as("term_df"))
      .filter(col("term_df") >= minDf)
    val aCnt = terms.groupBy("term", "cls").agg(countDistinct(col("doc")).as("n_both"))
    val joined = aCnt
      .join(tCnt, "term") // df floor applies here
      .join(broadcast(cCnt), "cls")
      .crossJoin(broadcast(n))
    // 2x2 cells from exact longs: a = n_both, b = T - a, c = C - a,
    // d = N - T - C + a; chi2 = N(ad - bc)^2 / (T(N-T)C(N-C)) as ONE
    // pinned float tree over integer-exact inputs
    val aC = col("n_both"); val tC = col("term_df"); val cC = col("n_cls")
    val nC = col("n_total")
    // ad−bc is exact in decimal(38,0) (|ad−bc| ≤ N² — decimal keeps
    // it exact far past any long envelope, no silent wrap); the
    // denominator is ≤ N⁴ so its factors multiply in the DOUBLE
    // domain, pinned left-associative
    val dec = "decimal(38,0)"
    val adbc = aC.cast(dec) * (nC - tC - cC + aC).cast(dec) -
      (tC - aC).cast(dec) * (cC - aC).cast(dec)
    val den = tC.cast("double") * (nC - tC).cast("double") *
      cC.cast("double") * (nC - cC).cast("double")
    val chi2 = nC.cast("double") *
      (adbc.cast("double") * adbc.cast("double")) / den
    val scored = joined.filter(tC < nC && cC < nC)
      .select(col("cls"), col("term"), col("n_both"), col("term_df"),
        round(chi2 * lit(1e6)).cast("long").as("chi2_e6"))
    val w = Window.partitionBy("cls")
      .orderBy(col("chi2_e6").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
  }
}
