package graft.walk

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-local skip-gram trainer with negative sampling (SURVEY §2.8
  * M3) — the fast path behind [[DeepWalkRecommender]].
  *
  * The reference trains gensim `Word2Vec(sg=1)` over walk sentences
  * (`deep_walk_based/model.py:62-76`); gensim is a multithreaded C
  * kernel over in-memory sentences. MLlib's `Word2Vec` reproduces the
  * semantics but pays a per-iteration broadcast + per-partition model
  * replica + average cycle that costs ~35 s on the headline graph —
  * 88% of a node2vec fold. This object is the gensim-shaped
  * counterpart: walk corpora are tiny relative to their training cost
  * (the headline corpus is ~10M ints ≈ 80 MB), so below a size gate we
  * collect the sentences once and run shared-memory Hogwild SGD on the
  * driver — the same plan shape as the classic word2vec.c / gensim
  * implementation, with the walk GENERATION still fully distributed.
  *
  * Above the gate ([[DeepWalkRecommender]] dispatches), training stays
  * on MLlib's distributed implementation — parameters there are
  * per-partition replicas, the 100 TB-corpus path.
  *
  * Algorithm: standard SGNS (word2vec.c lines 522-599 shape):
  * dynamic window shrink `b ∈ [1, window]`, unigram^0.75 negative
  * table, sigmoid lookup table, linear lr decay to 1e-4·lr. Node ids
  * are the dense ints produced by `KGraph.relabel`, so the "vocab" is
  * an array index — no string hashing anywhere.
  *
  * Determinism: with `threads = 1` the result is bit-exact for a fixed
  * seed (specs pin this); with more threads Hogwild races make runs
  * differ by design (as in gensim with workers > 1). Embedding VALUES
  * are seed-sensitive everywhere (SURVEY §7), so q40/q41 stay
  * rows-only regardless.
  */
object SkipGram {

  /** Sigmoid lookup: EXP_TABLE_SIZE entries over [-MAX_EXP, MAX_EXP]. */
  private val MaxExp = 6.0f
  private val ExpTableSize = 1024
  private val expTable: Array[Float] = Array.tabulate(ExpTableSize) { i =>
    val x = (i.toDouble / ExpTableSize * 2.0 - 1.0) * MaxExp
    val e = math.exp(x)
    (e / (e + 1.0)).toFloat
  }

  /** xorshift64* — fast thread-private RNG (public-domain Vigna
    * construction), seeded per thread so runs are reproducible at
    * threads = 1. */
  private final class Rng(seedIn: Long) {
    private var s: Long = if (seedIn == 0L) 0x9e3779b97f4a7c15L else seedIn
    def nextLong(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545f4914f6cdd1dL
    }
    /** uniform in [0, n) */
    def nextInt(n: Int): Int = {
      val r = nextLong() >>> 1
      (r % n).toInt
    }
  }

  /** Train SGNS over integer sentences.
    *
    * @param sentences walk paths; token values must lie in [0, vocabSize)
    * @param vocabSize dense id domain (relabel's node count)
    * @return input-embedding matrix, row i = vector of token i; rows for
    *         tokens below `minCount` are null (dropped downstream)
    */
  private[graft] def fitLocal(sentences: Array[Array[Int]], vocabSize: Int, dim: Int,
                              window: Int, epochs: Int, lr: Double, negative: Int,
                              minCount: Int, seed: Long, threads: Int): Array[Array[Float]] = {
    require(vocabSize > 0 && dim > 0 && window > 0 && epochs > 0 && negative >= 0)
    // --- vocab frequencies (for minCount + the unigram^0.75 table)
    val freq = new Array[Long](vocabSize)
    var si = 0
    var corpusTokens = 0L
    while (si < sentences.length) {
      val s = sentences(si)
      var j = 0
      while (j < s.length) { freq(s(j)) += 1L; j += 1 }
      corpusTokens += s.length
      si += 1
    }
    val kept: Array[Boolean] = freq.map(_ >= math.max(minCount, 1).toLong)

    // Walker alias table over kept tokens' unigram^0.75 mass — O(1) per
    // negative draw (one index, one coin, two reads), vs the ~log(vocab)
    // branchy binary search a cumulative table costs: negatives are drawn
    // ~5× per pair, so the sampler is on the innermost path
    val keptTok = (0 until vocabSize).filter(kept).toArray
    val m = keptTok.length
    require(m > 0, "minCount filtered out every token")
    val aliasProb = new Array[Double](m)
    val alias = new Array[Int](m)
    locally {
      val mass = keptTok.map(t => math.pow(freq(t).toDouble, 0.75))
      val total = mass.sum
      val scaled = mass.map(_ * m / total)
      val small = new java.util.ArrayDeque[Int](); val large = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < m) { if (scaled(j) < 1.0) small.add(j) else large.add(j); j += 1 }
      while (!small.isEmpty && !large.isEmpty) {
        val s = small.poll(); val l = large.poll()
        aliasProb(s) = scaled(s); alias(s) = l
        scaled(l) -= 1.0 - scaled(s)
        if (scaled(l) < 1.0) small.add(l) else large.add(l)
      }
      while (!large.isEmpty) { val l = large.poll(); aliasProb(l) = 1.0; alias(l) = l }
      while (!small.isEmpty) { val s = small.poll(); aliasProb(s) = 1.0; alias(s) = s }
    }
    // negative draws happen inline in the training loop (two independent
    // RNG words per draw: sharing one word's bits between the slot index
    // and the coin would correlate them on small m)

    // --- parameters: input (syn0) random-init, output (syn1neg) zero.
    // Init is indexed by (seed, position) so it does not depend on
    // thread count.
    val syn0 = new Array[Float](vocabSize * dim)
    val syn1 = new Array[Float](vocabSize * dim)
    val initRng = new Rng(seed * 0x9e3779b9L + 17)
    var i = 0
    while (i < syn0.length) {
      syn0(i) = (((initRng.nextLong() >>> 11).toDouble / (1L << 53).toDouble - 0.5) / dim).toFloat
      i += 1
    }

    val totalWork = corpusTokens * epochs.toLong
    val processed = new AtomicLong(0L)
    val lrFloor = lr * 1e-4

    def trainSlice(threadIdx: Int): Unit = {
      val rng = new Rng(seed + 0x51ab1e * (threadIdx + 1))
      val neu1e = new Array[Float](dim)
      // hoist closure-captured state into locals: everything below sits on
      // the innermost loop, and JIT treats locals better than the closure
      // fields scalac would otherwise read through
      val s0 = syn0; val s1 = syn1; val keptL = kept
      val tokL = keptTok; val probL = aliasProb; val aliasL = alias; val mL = m
      val exp = expTable
      var localProcessed = 0L
      var alpha = lr
      var epoch = 0
      while (epoch < epochs) {
        // contiguous slice per thread — no work queue, no locks
        val lo = (sentences.length.toLong * threadIdx / threads).toInt
        val hi = (sentences.length.toLong * (threadIdx + 1) / threads).toInt
        var s = lo
        while (s < hi) {
          val sent = sentences(s)
          val n = sent.length
          var pos = 0
          while (pos < n) {
            val center = sent(pos)
            if (keptL(center)) {
              val b = 1 + rng.nextInt(window) // dynamic window, word2vec.c:536
              var cpos = math.max(0, pos - b)
              val cend = math.min(n - 1, pos + b)
              while (cpos <= cend) {
                val ctx = sent(cpos)
                if (cpos != pos && keptL(ctx)) {
                  // SGNS update: input = center (syn0), outputs = ctx +
                  // negatives (syn1)
                  val l1 = center * dim
                  java.util.Arrays.fill(neu1e, 0.0f)
                  var d = 0
                  while (d <= negative) {
                    var target = 0
                    var label = 0.0f
                    if (d == 0) { target = ctx; label = 1.0f }
                    else {
                      // inline alias draw (drawNegative) on hoisted locals
                      val kk = ((rng.nextLong() >>> 1) % mL).toInt
                      val u = (rng.nextLong() >>> 11).toDouble / (1L << 53).toDouble
                      target = tokL(if (u < probL(kk)) kk else aliasL(kk))
                      if (target == ctx) target = -1 // skip collision
                    }
                    if (target >= 0) {
                      val l2 = target * dim
                      var f = 0.0f
                      var k = 0
                      while (k < dim) { f += s0(l1 + k) * s1(l2 + k); k += 1 }
                      val sg =
                        if (f >= MaxExp) 1.0f
                        else if (f <= -MaxExp) 0.0f
                        else exp(((f / MaxExp + 1.0f) * (ExpTableSize / 2)).toInt.min(ExpTableSize - 1))
                      val g = ((label - sg) * alpha).toFloat
                      k = 0
                      while (k < dim) {
                        neu1e(k) += g * s1(l2 + k)
                        s1(l2 + k) += g * s0(l1 + k)
                        k += 1
                      }
                    }
                    d += 1
                  }
                  var k = 0
                  while (k < dim) { s0(l1 + k) += neu1e(k); k += 1 }
                }
                cpos += 1
              }
            }
            pos += 1
            localProcessed += 1L
            // decay lr in 10k-token strides to keep the atomic cold
            if ((localProcessed & 0x3fff) == 0L) {
              val done = processed.addAndGet(0x4000L)
              alpha = math.max(lrFloor, lr * (1.0 - done.toDouble / totalWork))
            }
          }
          s += 1
        }
        epoch += 1
      }
    }

    if (threads <= 1) trainSlice(0)
    else {
      val pool = new Array[Thread](threads)
      val failure = new java.util.concurrent.atomic.AtomicReference[Throwable](null)
      var t = 0
      while (t < threads) {
        val idx = t
        pool(t) = new Thread(() =>
          try trainSlice(idx)
          catch { case e: Throwable => failure.compareAndSet(null, e) },
          s"graft-sgns-$idx")
        pool(t).start()
        t += 1
      }
      pool.foreach(_.join())
      if (failure.get() != null) throw failure.get()
    }

    Array.tabulate(vocabSize) { v =>
      if (!kept(v)) null
      else java.util.Arrays.copyOfRange(syn0, v * dim, v * dim + dim)
    }
  }

  /** DataFrame front door: walks (path: array<long>) → (node_id: long,
    * vec: array<double>) matching MLlib's `getVectors` + relabel
    * join-back shape. One distributed scan collects the corpus; tokens
    * are assumed dense in [0, vocabSize) — `KGraph.relabel`'s contract. */
  def fit(spark: SparkSession, walks: DataFrame, vocabSize: Int, dim: Int, window: Int,
          epochs: Int, lr: Double, negative: Int = 5, minCount: Int = 0, seed: Long = 42L,
          threads: Int = Runtime.getRuntime.availableProcessors()): DataFrame = {
    val sentences: Array[Array[Int]] = walks.select(col("path").cast("array<int>"))
      .rdd.map(_.getSeq[Int](0).toArray).collect()
    val emb = fitLocal(sentences, vocabSize, dim, window, epochs, lr, negative,
      minCount, seed, threads)
    val rows = emb.iterator.zipWithIndex.collect {
      case (v, id) if v != null => (id.toLong, v.map(_.toDouble))
    }.toSeq
    import spark.implicits._
    rows.toDF("node_id", "vec").repartition(spark.sparkContext.defaultParallelism)
  }
}
