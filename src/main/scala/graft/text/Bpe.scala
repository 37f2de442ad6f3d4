package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer primitives (Sennrich et al. 2016 — the
  * vocabulary-induction algorithm behind GPT-2/RoBERTa tokenizers; the
  * "BPE-ish" leg of the mandate's token-counting bullet).
  *
  * Representation: every token is WRAPPED in [[Sep]] (U+001F, absent
  * from any text corpus): word "tom" tokenizes as "␟t␟␟o␟␟m␟".
  * Applying merge (a, b) is then ONE string replace of "␟a␟␟b␟" with
  * "␟ab␟". The wrapping is load-bearing in two ways: (1) each token
  * carries its OWN start and end markers, so a merge pattern can only
  * match a whole token — a bare "a␟b" pattern would also match a token
  * SUFFIX (e.g. (m, er) firing inside "om␟er", corrupting the
  * tokenization the moment a learned symbol is a suffix of another) —
  * and (2) consecutive matches never share characters, so plain
  * left-to-right non-overlapping replace is exactly BPE's greedy merge
  * scan ("aaa" + (a,a) → ["aa","a"]; "ab ab" merges both pairs). Every
  * step is a codegen'd string function with identical semantics in
  * ANSI SQL, so the DuckDB oracle replays encoding bit-for-bit (q96)
  * and the training round's pair-count aggregation verbatim (q95).
  *
  * Scale shape: training iterates over the WORD VOCABULARY (word,
  * freq) — the classic trick that makes BPE corpus-size-independent:
  * the corpus is scanned once (word-count aggregation, map-side
  * combined); each merge round is one pair-count aggregation over the
  * vocab plus a narrow replace, and only the single best pair ever
  * reaches the driver. Encoding is a pure per-row expression chain —
  * no joins, no shuffles, no state. */
object Bpe {

  /** U+001F unit separator — token boundary within a word. Reserved:
    * [[clean]] strips it from all input text, so a corpus that happens
    * to contain U+001F cannot silently corrupt the wrapped
    * tokenization or the separator-counting token arithmetic (both
    * engines used to be bug-compatible on such input — the oracle
    * could never catch it). */
  val Sep = "\u001f"

  /** Input normalization: lowercase + strip the reserved separator. */
  private def clean(textCol: Column): Column =
    translate(lower(textCol), Sep, "")

  /** (word, f): corpus word vocabulary with frequencies. One map-side
    * combined aggregation; empty words (doubled spaces) dropped on both
    * engines. */
  def wordFreq(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(split(clean(col(textCol)), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("f"))

  /** Character-split `w` into the Sep-wrapped initial tokenization
    * ("tom" → "␟t␟␟o␟␟m␟"). Native codegen'd kernel
    * ([[graft.functions.CharInterleave]]) — the HOF formulation
    * (array_join ∘ transform ∘ substr) allocated one single-char
    * UTF8String per character per row outside whole-stage codegen and
    * dominated encode CPU at scale. */
  private def charSplit(w: Column): Column =
    concat(lit(Sep), graft.functions.CharInterleave(w, lit(Sep + Sep)), lit(Sep))

  /** Apply one merge: join adjacent WHOLE tokens a,b into ab (each
    * token's own wrapping anchors the match — see the object doc). */
  private def applyMerge(tok: Column, a: String, b: String): Column =
    replace(tok, lit(Sep + a + Sep + Sep + b + Sep), lit(Sep + a + b + Sep))

  /** Adjacent-pair counts over the current vocab tokenization, weighted
    * by word frequency: (a, b, cnt). The distributed core of one
    * training round. */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(split(trim(col("tok"), Sep), Sep + Sep).as("syms"), col("f"))
      .filter(size(col("syms")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(syms) - 1),
          |  i -> struct(element_at(syms, i) AS a, element_at(syms, i + 1) AS b))""".stripMargin))
        .as("p"), col("f"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum("f").as("cnt"))

  /** (tok, f): the vocabulary in its initial (character) tokenization. */
  def initialVocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    wordFreq(docs, textCol).select(charSplit(col("word")).as("tok"), col("f"))

  /** Learn `nMerges` merges. Driver loop; per round one pair-count
    * aggregation (top-1 via orderBy-limit — a bounded single row
    * reaches the driver) and one narrow replace over the vocab. Ties
    * broken (cnt DESC, a ASC, b ASC) for determinism. */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text"): Seq[(String, String)] = {
    import org.apache.spark.storage.StorageLevel
    var vocab = initialVocab(docs, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    vocab.count()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val top = pairCounts(vocab)
        .orderBy(desc("cnt"), col("a"), col("b")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        val next = vocab
          .withColumn("tok", applyMerge(col("tok"), a, b))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        vocab.unpersist(blocking = false)
        vocab = next
      }
    }
    vocab.unpersist(blocking = false)
    merges.toSeq
  }

  /** Driver-local merge learning over a collected (word, f) vocab —
    * EXACTLY [[train]]'s greedy semantics (adjacent pairs weighted by
    * word frequency, duplicates within a word counted, left-to-right
    * non-overlapping merge application, ties (cnt DESC, a ASC, b ASC))
    * with zero Spark jobs. Package-private seam for
    * [[trainSampled]]'s parity spec. */
  private[text] def trainLocal(vocab: Seq[(String, Long)],
                               nMerges: Int): Seq[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toArray, f) }.toArray
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    while (merges.length < nMerges && !done) {
      val cnt = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          cnt.update(k, cnt.getOrElse(k, 0L) + f)
          i += 1
        }
      }
      if (cnt.isEmpty) done = true
      else {
        val ((a, b), _) = cnt.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        words = words.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
              out += (a + b); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
      }
    }
    merges.toSeq
  }

  /** Sampled training — the production tokenizer recipe: [[train]]
    * pays one distributed pair-count aggregation PER MERGE (correct
    * and corpus-size-independent per round, but a 50k-merge production
    * vocab means 50k Spark jobs), while the standard practice trains
    * the tokenizer on a SAMPLE. This mode draws a length-weighted
    * reservoir of documents ([[graft.util.Sampling.weightedReservoir]]
    * — longer docs carry proportionally more of the pair mass),
    * aggregates the sampled word vocabulary ONCE, collects it (gated
    * by `maxVocabRows` — a 10k-doc sample's distinct-word vocab is
    * bounded by sample content, not corpus size), and learns all
    * merges driver-locally: the total Spark-job count is O(1) in
    * `nMerges`. Encoding stays the unchanged full-corpus [[encode]].
    *
    * With `sampleDocs` ≥ the corpus row count the sample IS the corpus
    * and the result equals [[train]] exactly (spec-pinned). */
  def trainSampled(docs: DataFrame, nMerges: Int, sampleDocs: Long,
                   seed: Long, textCol: String = "text",
                   maxVocabRows: Long = 2000000L): Seq[(String, String)] = {
    val sampled = graft.util.Sampling.weightedReservoir(
      docs.select(col("doc_id"), col(textCol))
        .withColumn("__w", length(col(textCol)).cast("double")),
      sampleDocs, "__w", Seq("doc_id"), seed)
    val wf = wordFreq(sampled, textCol)
      .collect()
    require(wf.length <= maxVocabRows,
      s"bpe sampled vocab ${wf.length} rows exceeds maxVocabRows=$maxVocabRows — shrink sampleDocs")
    // sort for determinism of the in-memory scan order (counting is
    // order-independent; the sort makes debugging reproducible)
    trainLocal(wf.map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq,
      nMerges)
  }

  /** Tokenize every document with a FIXED merge list (the production
    * op: apply a released vocab's merge table to a corpus). Pure
    * expression chain — `merges.length` nested replaces per word.
    * Returns (doc_id, n_words, n_tokens, tokens) where `tokens` is the
    * space-joined token stream (word boundaries collapse to the same
    * space — fingerprint-stable, not invertible). */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             textCol: String = "text"): DataFrame = {
    val wordTok = (w: Column) =>
      merges.foldLeft(charSplit(w)) { case (acc, (a, b)) => applyMerge(acc, a, b) }
    docs
      // words staged ONCE: codegen does not CSE duplicated lambda
      // subtrees, and the next projection references it twice
      .select(col("doc_id"),
        filter(split(clean(col(textCol)), " "), w => length(w) > 0).as("__ws"))
      .select(col("doc_id"),
        array_join(transform(col("__ws"), wordTok), " ").as("ts"),
        size(col("__ws")).cast("long").as("n_words"))
      .select(col("doc_id"), col("n_words"),
        // each token contributes exactly 2 wrapper separators
        ((length(col("ts")) - length(replace(col("ts"), lit(Sep), lit("")))) / 2)
          .cast("long").as("n_tokens"),
        // ␟␟ token boundaries -> space, then the word-edge ␟ wrappers drop
        replace(replace(col("ts"), lit(Sep + Sep), lit(" ")), lit(Sep), lit(""))
          .as("tokens"))
  }
}
