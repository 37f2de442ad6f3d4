package graft.text

import scala.collection.mutable

/** Exact reimplementation of the classic fuzzywuzzy `WRatio` scorer
  * (python-Levenshtein ratio + difflib matching blocks) that the
  * reference uses for entity disambiguation
  * (`thefuzz.process.extractOne`, `data_integration/movielens.py:127`).
  *
  * Backend precision: this matches the CLASSIC backend exactly —
  * integer-rounded component scores fed through the scale factors, and
  * partial-ratio windows anchored at difflib matching blocks. thefuzz
  * builds ≥0.20 delegate to rapidfuzz, which keeps components as floats
  * until one final round and scans additional partial alignments; on
  * rare candidate pairs the two backends differ by ±1 (a known
  * fuzzywuzzy↔rapidfuzz discrepancy), which can flip an extractOne pick
  * whose top-2 scores are that close. Recorded in DEVIATIONS #4.
  *
  * Components, faithful to the published algorithm:
  *  - `full_process`: non-word chars (python `\W`, i.e. everything but
  *    letters/digits/underscore) become spaces; lowercase; strip.
  *  - `ratio`: Indel similarity ×100 (Levenshtein with substitution
  *    cost 2 — equivalently `2·LCS/(|a|+|b|)`), rounded half-to-even as
  *    python3's `int(round(x))` does.
  *  - `partial_ratio`: best `ratio` of the shorter string against the
  *    same-length substrings of the longer anchored at difflib
  *    `SequenceMatcher.get_matching_blocks()` alignments (including the
  *    autojunk rule for |b| ≥ 200).
  *  - `token_sort` / `token_set` variants and their `partial_` forms.
  *  - `WRatio`: max over the component scores with the published
  *    0.95/0.9/0.6 scale factors, picking the partial family only when
  *    the processed length ratio ≥ 1.5.
  *
  * Every step is a pure function of the two strings — deterministic
  * under any partitioning/retry, per SURVEY §4.5.
  */
object FuzzyMatch {

  /** utils.full_process: `\W` → space, lowercase, strip. */
  def fullProcess(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (Character.isLetterOrDigit(c) || c == '_') Character.toLowerCase(c) else ' ')
      i += 1
    }
    sb.toString.trim
  }

  /** python3 `int(round(x))` — half rounds to even. */
  private def intr(x: Double): Int = math.rint(x).toInt

  /** Longest common subsequence length, O(|a|·|b|) time, O(|b|) space. */
  private def lcs(a: String, b: String): Int = {
    val n = b.length
    val dp = new Array[Int](n + 1)
    var i = 0
    while (i < a.length) {
      var prev = 0
      var j = 0
      val ca = a.charAt(i)
      while (j < n) {
        val tmp = dp(j + 1)
        dp(j + 1) =
          if (ca == b.charAt(j)) prev + 1
          else math.max(dp(j + 1), dp(j))
        prev = tmp
        j += 1
      }
      i += 1
    }
    dp(n)
  }

  /** fuzz.ratio on ALREADY-processed strings: 0-100 int. */
  def ratio(a: String, b: String): Int = {
    val lensum = a.length + b.length
    if (lensum == 0) return 100 // ratio('','') == 1.0 in python-Levenshtein
    intr(200.0 * lcs(a, b) / lensum)
  }

  // ---- difflib.SequenceMatcher.get_matching_blocks ---------------------

  /** difflib's find_longest_match + block recursion + adjacent-merge +
    * sentinel, with the autojunk rule (elements filling >1% of a b with
    * |b| ≥ 200 are dropped from the index). */
  private[graft] def matchingBlocks(a: String, b: String): Seq[(Int, Int, Int)] = {
    val b2j = mutable.HashMap.empty[Char, mutable.ArrayBuffer[Int]]
    var j = 0
    while (j < b.length) {
      b2j.getOrElseUpdate(b.charAt(j), mutable.ArrayBuffer.empty) += j
      j += 1
    }
    // autojunk: popular elements leave the index but stay matchable via
    // the junk-extension phase below, exactly as difflib does it
    val junk = mutable.HashSet.empty[Char]
    if (b.length >= 200) {
      val ntest = b.length / 100 + 1
      b2j.foreach { case (c, idxs) => if (idxs.length > ntest) junk += c }
      junk.foreach(b2j.remove)
    }

    def findLongest(alo: Int, ahi: Int, blo: Int, bhi: Int): (Int, Int, Int) = {
      var besti = alo; var bestj = blo; var bestsize = 0
      var j2len = mutable.HashMap.empty[Int, Int]
      var i = alo
      while (i < ahi) {
        val newj2len = mutable.HashMap.empty[Int, Int]
        b2j.get(a.charAt(i)).foreach(_.foreach { jj =>
          if (jj >= blo && jj < bhi) {
            val k = j2len.getOrElse(jj - 1, 0) + 1
            newj2len(jj) = k
            if (k > bestsize) { besti = i - k + 1; bestj = jj - k + 1; bestsize = k }
          }
        })
        j2len = newj2len
        i += 1
      }
      // difflib's two extension phases: first grow over equal NON-junk
      // neighbors, then over equal junk neighbors (order matters — a
      // non-junk char beyond a junk run is not reconsidered)
      def canLeft(isJunk: Boolean) =
        besti > alo && bestj > blo && junk.contains(b.charAt(bestj - 1)) == isJunk &&
          a.charAt(besti - 1) == b.charAt(bestj - 1)
      def canRight(isJunk: Boolean) =
        besti + bestsize < ahi && bestj + bestsize < bhi &&
          junk.contains(b.charAt(bestj + bestsize)) == isJunk &&
          a.charAt(besti + bestsize) == b.charAt(bestj + bestsize)
      Seq(false, true).foreach { isJunk =>
        while (canLeft(isJunk)) { besti -= 1; bestj -= 1; bestsize += 1 }
        while (canRight(isJunk)) bestsize += 1
      }
      (besti, bestj, bestsize)
    }

    val stack = mutable.Stack((0, a.length, 0, b.length))
    val blocks = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    while (stack.nonEmpty) {
      val (alo, ahi, blo, bhi) = stack.pop()
      val (i, jj, k) = findLongest(alo, ahi, blo, bhi)
      if (k > 0) {
        blocks += ((i, jj, k))
        if (alo < i && blo < jj) stack.push((alo, i, blo, jj))
        if (i + k < ahi && jj + k < bhi) stack.push((i + k, ahi, jj + k, bhi))
      }
    }
    val sorted = blocks.sortBy(identity).toSeq
    // merge adjacent equal blocks exactly as difflib does
    val merged = mutable.ArrayBuffer.empty[(Int, Int, Int)]
    sorted.foreach { case (i2, j2, k2) =>
      merged.lastOption match {
        case Some((i1, j1, k1)) if i1 + k1 == i2 && j1 + k1 == j2 =>
          merged(merged.length - 1) = (i1, j1, k1 + k2)
        case _ => merged += ((i2, j2, k2))
      }
    }
    merged.toSeq :+ ((a.length, b.length, 0))
  }

  /** fuzz.partial_ratio on processed strings: 0-100 int. */
  def partialRatio(s1: String, s2: String): Int = {
    val (shorter, longer) = if (s1.length <= s2.length) (s1, s2) else (s2, s1)
    var best = 0.0
    val it = matchingBlocks(shorter, longer).iterator
    while (it.hasNext) {
      val (i, j, _) = it.next()
      val start = math.max(j - i, 0)
      val end = math.min(start + shorter.length, longer.length)
      val sub = longer.substring(start, end)
      val lensum = shorter.length + sub.length
      val r = if (lensum == 0) 100.0 else 200.0 * lcs(shorter, sub) / lensum
      if (r > 99.5) return 100
      if (r > best) best = r
    }
    intr(best)
  }

  private def tokens(s: String): Array[String] = s.split("\\s+").filter(_.nonEmpty)

  private def sortJoin(s: String): String = tokens(s).sorted.mkString(" ")

  def tokenSortRatio(a: String, b: String): Int = ratio(sortJoin(a), sortJoin(b))

  def partialTokenSortRatio(a: String, b: String): Int =
    partialRatio(sortJoin(a), sortJoin(b))

  private def tokenSetScore(a: String, b: String, partial: Boolean): Int = {
    val t1 = tokens(a).toSet
    val t2 = tokens(b).toSet
    val sect = (t1 & t2).toSeq.sorted.mkString(" ")
    val d12 = (t1 -- t2).toSeq.sorted.mkString(" ")
    val d21 = (t2 -- t1).toSeq.sorted.mkString(" ")
    val c12 = (sect + " " + d12).trim
    val c21 = (sect + " " + d21).trim
    val f: (String, String) => Int = if (partial) partialRatio else ratio
    Seq(f(sect, c12), f(sect, c21), f(c12, c21)).max
  }

  def tokenSetRatio(a: String, b: String): Int = tokenSetScore(a, b, partial = false)

  def partialTokenSetRatio(a: String, b: String): Int = tokenSetScore(a, b, partial = true)

  /** fuzz.WRatio with full processing: 0-100 int. */
  def wratio(s1: String, s2: String): Int = {
    val p1 = fullProcess(s1)
    val p2 = fullProcess(s2)
    if (p1.isEmpty || p2.isEmpty) return 0
    val base = ratio(p1, p2).toDouble
    val lenRatio = math.max(p1.length, p2.length).toDouble / math.min(p1.length, p2.length)
    val unbase = 0.95
    val best =
      if (lenRatio < 1.5)
        math.max(base, math.max(
          tokenSortRatio(p1, p2) * unbase,
          tokenSetRatio(p1, p2) * unbase))
      else {
        val partialScale = if (lenRatio > 8) 0.6 else 0.9
        math.max(math.max(base, partialRatio(p1, p2) * partialScale), math.max(
          partialTokenSortRatio(p1, p2) * unbase * partialScale,
          partialTokenSetRatio(p1, p2) * unbase * partialScale))
      }
    intr(best)
  }
}
