package graft.oracle

/** Builds the DuckDB SQL that independently replays q45's uniform
  * random walks (reference walker.py:12-55; kernel
  * `RandomWalks.randomWalks`). The walks are a pure function of the
  * seeded XXH64 chain `h=42 → hashLong(start) → hashLong(walk_idx) →
  * hashInt(step) → hashLong(seed)`, so the oracle re-derives Spark's
  * `XXH64.hashLong/hashInt` (catalyst expressions.XXH64 — public
  * xxHash constants) in portable SQL and replays every transition.
  *
  * Shape notes, learned the hard way (all variants validated cell-exact
  * against the engine's walks before this one was chosen):
  *  - mod-2^64 products can't use HUGEINT directly (signed int128
  *    overflows on a 64×64 multiply); [[mul]] splits the left operand
  *    into 32-bit halves so every intermediate stays < 2^97.
  *  - a step-unrolled CTE chain plans in ~60 s: DuckDB binds lateral
  *    column aliases and single-reference CTEs by substitution, and
  *    every xor/rotl references its operand twice, so the bound
  *    expression tree grows ~16× per hash call. Instead the walk runs
  *    as ONE recursive CTE whose iteration applies a small register
  *    update — the expression is bound once, planning is O(1).
  *  - one whole 4-call chain per iteration re-explodes textually
  *    (~400 KB/branch → OOM from per-node intermediate vectors); one
  *    full hash call per phase is the sweet spot: 3 phases per call
  *    (t := k1-mix of the input; h := seed-combine+rotate; h := fmix)
  *    ⇒ 13 iterations per walk step, ~30 KB of SQL.
  *  - `adj` must be AS MATERIALIZED: inlined, its upstream (the
  *    orders⋈lineitem ratings join) re-executes on every iteration.
  */
object XxhWalkSql {

  private val M = "18446744073709551616::HUGEINT" // 2^64

  // XXH64 primes (public xxHash constants)
  private val P1 = java.lang.Long.parseUnsignedLong("9E3779B185EBCA87", 16)
  private val P2 = java.lang.Long.parseUnsignedLong("C2B2AE3D27D4EB4F", 16)
  private val P3 = java.lang.Long.parseUnsignedLong("165667B19E3779F9", 16)
  private val P4 = java.lang.Long.parseUnsignedLong("85EBCA77C2B2AE63", 16)
  private val P5 = java.lang.Long.parseUnsignedLong("27D4EB2F165667C5", 16)

  private def u(x: Long): String = java.lang.Long.toUnsignedString(x) + "::UBIGINT"

  private def mul(a: String, b: String): String =
    s"((((($a)::HUGEINT % 4294967296::HUGEINT) * ($b)::HUGEINT" +
      s" + (((($a)::HUGEINT // 4294967296::HUGEINT) * ($b)::HUGEINT)" +
      s" % 4294967296::HUGEINT) * 4294967296::HUGEINT) % $M)::UBIGINT)"

  private def add(a: String, b: String): String =
    s"(((($a)::HUGEINT + ($b)::HUGEINT) % $M)::UBIGINT)"

  /** rotl64: the two parts occupy disjoint bit ranges, so `+` cannot
    * carry. */
  private def rotl(x: String, r: Int): String =
    s"(${mul(x, s"${1L << r}::UBIGINT")} + (($x) >> ${64 - r}))"

  private def xor(a: String, b: String): String =
    s"xor(($a)::UBIGINT, ($b)::UBIGINT)"

  /** XXH64 final avalanche of `h`, as one expression. */
  private def fmix(h: String): String = {
    val a = xor(h, s"(($h) >> 33)")
    val b = mul(a, u(P2))
    val c = xor(b, s"(($b) >> 29)")
    val d = mul(c, u(P3))
    xor(d, s"(($d) >> 32)")
  }

  /** Iterations per walk step: 4 hash calls × 3 phases + 1 transition. */
  private val PH = 13

  /** Register-update branches `(phase → expr)` for the t and h columns.
    * Hash j of a step consumes: j=0 start (reseeding the chain at 42),
    * j=1 walk_idx, j=2 the step number (hashInt), j=3 the seed 42. */
  private def branches(seed: Long): (Map[Int, String], Map[Int, String]) = {
    val tB = scala.collection.mutable.Map.empty[Int, String]
    val hB = scala.collection.mutable.Map.empty[Int, String]
    for (j <- 0 until 4) {
      val base = j * 3
      val (ac, rc, mp, pc) =
        if (j == 2) (P5 + 4, 23, P2, P3) else (P5 + 8, 27, P1, P4)
      if (j == 2) // hashInt: k1 is just input * P1 (input < 2^32)
        tB(base) = mul(s"(w.it // $PH + 1)::UBIGINT", u(P1))
      else {
        val inp = j match {
          case 0 => "w.start::UBIGINT"
          case 1 => "w.walk_idx::UBIGINT"
          case _ => s"$seed::UBIGINT"
        }
        tB(base) = mul(rotl(mul(inp, u(P2)), 31), u(P1))
      }
      val seedIn =
        if (j == 0) u(seed + ac) // stepHash restarts at h = seed
        else add("w.h", u(ac))
      hB(base + 1) = add(mul(rotl(xor(seedIn, "w.t"), rc), u(mp)), u(pc))
      hB(base + 2) = fmix("w.h")
    }
    (tB.toMap, hB.toMap)
  }

  /** The q45 pipeline downstream of the shared `ratings` CTE: the
    * ts-ratio split (q09 semantics) bounded to user_id < 200, the
    * labeled bipartite graph with dense sorted relabel
    * (`KGraph.relabel`), symmetric sorted adjacency
    * (`RandomWalks.adjacency`), then the recursive walk. NOTE: the
    * caller prepends `Tables.ratingsSql`, whose `WITH` this output
    * upgrades to `WITH RECURSIVE` via the returned marker — see
    * [[q45Sql]]. */
  private def walkSql(nWalks: Int, walkLen: Int, seed: Long): String = {
    val nit = PH * (walkLen - 1)
    val tr = PH - 1
    val wis = (0 until nWalks).map(i => s"($i)").mkString(", ")
    val (tB, hB) = branches(seed)
    def cases(m: Map[Int, String], reg: String) =
      s"CASE w.it % $PH " +
        m.toSeq.sortBy(_._1).map { case (p, e) => s"WHEN $p THEN $e" }.mkString(" ") +
        s" ELSE w.$reg END"
    val hS = "(CASE WHEN w.h >= 9223372036854775808::UBIGINT" +
      s" THEN w.h::HUGEINT - $M ELSE w.h::HUGEINT END)"
    val idx = s"((($hS % len(a.nbrs)) + len(a.nbrs)) % len(a.nbrs))::BIGINT + 1"
    val nxt = s"(CASE WHEN a.nbrs IS NULL THEN NULL ELSE a.nbrs[$idx] END)"
    s""", split AS (
       |  SELECT user_id, item_id,
       |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, item_id, user_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY user_id) AS n
       |  FROM ratings
       |), train AS (
       |  SELECT user_id, item_id FROM split
       |  WHERE rn <= n - CEIL(n * 0.2) AND user_id < 200
       |), lbl AS (
       |  SELECT DISTINCT 'User(' || CAST(user_id AS VARCHAR) || ')' AS label FROM train
       |  UNION
       |  SELECT DISTINCT 'Item(' || CAST(item_id AS VARCHAR) || ')' AS label FROM train
       |), nodes AS (
       |  SELECT label, ROW_NUMBER() OVER (ORDER BY label) - 1 AS node_id FROM lbl
       |), iedges AS (
       |  SELECT u.node_id AS src, i.node_id AS dst
       |  FROM train t
       |  JOIN nodes u ON u.label = 'User(' || CAST(t.user_id AS VARCHAR) || ')'
       |  JOIN nodes i ON i.label = 'Item(' || CAST(t.item_id AS VARCHAR) || ')'
       |), sym AS (
       |  SELECT src, dst FROM iedges UNION SELECT dst, src FROM iedges
       |), adj AS MATERIALIZED (
       |  SELECT src AS node, LIST(DISTINCT dst ORDER BY dst) AS nbrs FROM sym GROUP BY src
       |), walk AS (
       |  SELECT node_id AS start, t.wi::BIGINT AS walk_idx, node_id AS cur,
       |         CAST(node_id AS VARCHAR) AS path_s, 0 AS it,
       |         0::UBIGINT AS h, 0::UBIGINT AS t
       |  FROM nodes, (VALUES $wis) t(wi)
       |  UNION ALL
       |  SELECT w.start, w.walk_idx,
       |         CASE WHEN w.it % $PH = $tr THEN $nxt ELSE w.cur END AS cur,
       |         CASE WHEN w.it % $PH = $tr AND $nxt IS NOT NULL
       |              THEN w.path_s || ',' || CAST($nxt AS VARCHAR)
       |              ELSE w.path_s END AS path_s,
       |         w.it + 1 AS it,
       |         ${cases(hB, "h")} AS h,
       |         ${cases(tB, "t")} AS t
       |  FROM walk w LEFT JOIN adj a ON w.it % $PH = $tr AND a.node = w.cur
       |  WHERE w.it < $nit
       |)
       |SELECT start, walk_idx, path_s FROM walk WHERE it = $nit""".stripMargin
  }

  /** Full q45 oracle statement. Takes the shared ratings prefix
    * (`Tables.ratingsSql`, a `WITH ratings AS (...)`) and upgrades its
    * `WITH` to `WITH RECURSIVE` — DuckDB requires the keyword on the
    * statement's single WITH clause. */
  def q45Sql(ratingsPrefix: String, nWalks: Int = 3, walkLen: Int = 6,
             seed: Long = 42L): String = {
    require(ratingsPrefix.startsWith("WITH "), "expected a WITH-prefix ratings CTE")
    "WITH RECURSIVE " + ratingsPrefix.drop("WITH ".length) +
      walkSql(nWalks, walkLen, seed)
  }

  // ——— q42: the biased (node2vec) kernel ———————————————————————————
  // Two XXH64 chains per step — `stepHash(…, seed)` drives the class
  // draw, `stepHash(…, seed+1)` the within-class index — sharing their
  // first three calls (start, walk_idx, step), so a step is 16 phases:
  // 9 shared-prefix + 3 chainB-final + 3 chainA-final + 1 transition.
  // The p/q class algebra (`RandomWalks.biasedWalks` local kernel:
  // back = prev, common = nbrs(cur)∖{prev} ∩ nbrs(prev) in nbrs(cur)
  // order, far = the rest) maps onto DuckDB list lambdas, and the draw
  // `r · (w_back + w_common + w_far)` is plain IEEE double arithmetic —
  // identical bit-for-bit across engines.

  private val PH42 = 16

  private def k1Long(inp: String): String =
    mul(rotl(mul(inp, u(P2)), 31), u(P1))

  private def combLong(seedIn: String, t: String): String =
    add(mul(rotl(xor(seedIn, t), 27), u(P1)), u(P4))

  private def combInt(seedIn: String, t: String): String =
    add(mul(rotl(xor(seedIn, t), 23), u(P2)), u(P3))

  /** Full q42 oracle statement (same WITH RECURSIVE upgrade as q45). */
  def q42Sql(ratingsPrefix: String, nWalks: Int = 2, walkLen: Int = 5,
             p: Double = 0.5, q: Double = 2.0, seed: Long = 42L): String = {
    require(ratingsPrefix.startsWith("WITH "), "expected a WITH-prefix ratings CTE")
    val nit = PH42 * (walkLen - 1)
    val tr = PH42 - 1
    val wis = (0 until nWalks).map(i => s"($i)").mkString(", ")
    val tB = Map(
      0 -> k1Long("w.start::UBIGINT"),
      3 -> k1Long("w.walk_idx::UBIGINT"),
      6 -> mul(s"(w.it // $PH42 + 1)::UBIGINT", u(P1)),
      9 -> k1Long(s"${seed + 1}::UBIGINT"),
      12 -> k1Long(s"$seed::UBIGINT"))
    val hB = Map(
      1 -> combLong(u(seed + P5 + 8), "w.t"), // chain reseeds at the walk seed
      2 -> fmix("w.h"),
      4 -> combLong(add("w.h", u(P5 + 8)), "w.t"),
      5 -> fmix("w.h"),
      7 -> combInt(add("w.h", u(P5 + 4)), "w.t"),
      8 -> fmix("w.h"),
      13 -> combLong(add("w.h", u(P5 + 8)), "w.t"),
      14 -> fmix("w.h"))
    val h2B = Map(
      10 -> combLong(add("w.h", u(P5 + 8)), "w.t"), // chainB branches off prefix h
      11 -> fmix("w.h2"))
    def cases(m: Map[Int, String], reg: String) =
      s"CASE w.it % $PH42 " +
        m.toSeq.sortBy(_._1).map { case (ph, e) => s"WHEN $ph THEN $e" }.mkString(" ") +
        s" ELSE w.$reg END"
    def signed(c: String) =
      s"(CASE WHEN $c >= 9223372036854775808::UBIGINT THEN $c::HUGEINT - $M ELSE $c::HUGEINT END)"
    val pm = "1000000007"
    val rdraw = s"(((${signed("w.h")} % $pm) + $pm) % $pm)::DOUBLE / 1000000007.0"
    val idx = s"(((${signed("w.h2")} % $pm) + $pm) % $pm)::BIGINT"
    val invP = 1.0 / p; val invQ = 1.0 / q
    val wback = s"(CASE WHEN list_contains(a.nbrs, w.prev) THEN $invP ELSE 0.0 END)"
    val common = "list_filter(a.nbrs, x -> x != w.prev AND list_contains(b.nbrs, x))"
    val far = "list_filter(a.nbrs, x -> x != w.prev AND NOT list_contains(b.nbrs, x))"
    val total = s"($wback + len($common)::DOUBLE + len($far)::DOUBLE * $invQ)"
    val nxt =
      s"""(CASE
         |      WHEN a.nbrs IS NULL THEN NULL
         |      WHEN w.it // $PH42 + 1 = 1 THEN a.nbrs[($idx % greatest(len(a.nbrs), 1)) + 1]
         |      ELSE (CASE
         |        WHEN $rdraw * $total < $wback THEN w.prev
         |        WHEN $rdraw * $total < $wback + len($common)::DOUBLE
         |          THEN ($common)[($idx % greatest(len($common), 1)) + 1]
         |        WHEN len($far) > 0 THEN ($far)[($idx % len($far)) + 1]
         |        ELSE NULL END)
         |      END)""".stripMargin
    "WITH RECURSIVE " + ratingsPrefix.drop("WITH ".length) +
      s""", split AS (
         |  SELECT user_id, item_id,
         |         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, item_id, user_id) AS rn,
         |         COUNT(*) OVER (PARTITION BY user_id) AS n
         |  FROM ratings
         |), train AS (
         |  SELECT user_id, item_id FROM split
         |  WHERE rn <= n - CEIL(n * 0.2) AND user_id < 100
         |), iedges AS (
         |  SELECT user_id::BIGINT AS src, (item_id + 1000000)::BIGINT AS dst FROM train
         |), sym AS (
         |  SELECT src, dst FROM iedges UNION SELECT dst, src FROM iedges
         |), adj AS MATERIALIZED (
         |  SELECT src AS node, LIST(DISTINCT dst ORDER BY dst) AS nbrs FROM sym GROUP BY src
         |), walk AS (
         |  SELECT node AS start, t.wi::BIGINT AS walk_idx, node AS cur,
         |         NULL::BIGINT AS prev, CAST(node AS VARCHAR) AS path_s, 0 AS it,
         |         0::UBIGINT AS h, 0::UBIGINT AS t, 0::UBIGINT AS h2
         |  FROM adj, (VALUES $wis) t(wi)
         |  UNION ALL
         |  SELECT w.start, w.walk_idx,
         |         CASE WHEN w.it % $PH42 = $tr THEN $nxt ELSE w.cur END AS cur,
         |         CASE WHEN w.it % $PH42 = $tr AND $nxt IS NOT NULL THEN w.cur
         |              ELSE w.prev END AS prev,
         |         CASE WHEN w.it % $PH42 = $tr AND $nxt IS NOT NULL
         |              THEN w.path_s || ',' || CAST($nxt AS VARCHAR)
         |              ELSE w.path_s END AS path_s,
         |         w.it + 1 AS it,
         |         ${cases(hB, "h")} AS h,
         |         ${cases(tB, "t")} AS t,
         |         ${cases(h2B, "h2")} AS h2
         |  FROM walk w
         |    LEFT JOIN adj a ON w.it % $PH42 = $tr AND a.node = w.cur
         |    LEFT JOIN adj b ON w.it % $PH42 = $tr AND b.node = w.prev
         |  WHERE w.it < $nit
         |)
         |SELECT start, walk_idx, path_s FROM walk WHERE it = $nit""".stripMargin
  }
}
