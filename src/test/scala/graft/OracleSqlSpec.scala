package graft

import graft.oracle.XxhWalkSql
import org.scalatest.funsuite.AnyFunSuite

/** Structural guards for the generated DuckDB oracle SQL. The walk
  * replays (q42/q45) were validated cell-exact against live engine
  * output when written; these checks can't re-run DuckDB from the JVM,
  * but they fail fast on the silent-generator-typo class of breakage
  * (unbalanced parens, a dropped phase, a leaked interpolation) that
  * would otherwise only surface as a red driver round. */
class OracleSqlSpec extends AnyFunSuite {

  private def structurallySound(sql: String, phases: Int, steps: Int): Unit = {
    assert(sql.startsWith("WITH RECURSIVE "), "must upgrade the WITH clause")
    assert(sql.contains("ratings AS ("), "must keep the shared ratings CTE")
    assert(sql.contains("AS MATERIALIZED ("), "adj must be materialized")
    // paren balance, never dipping negative
    var depth = 0
    sql.foreach { c =>
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; assert(depth >= 0, "unbalanced parens") }
    }
    assert(depth == 0, s"unbalanced parens: depth $depth at end")
    // the recursion bound is phases × steps and the final SELECT reads it
    val nit = phases * steps
    assert(sql.contains(s"WHERE w.it < $nit"), s"recursion bound $nit missing")
    assert(sql.contains(s"WHERE it = $nit"), s"final-iteration filter $nit missing")
    // no unexpanded Scala interpolation or Python artifacts
    assert(!sql.contains("$"), "leaked interpolation")
    assert(!sql.contains("None") && !sql.contains("null::UBIGINT"), "leaked literal")
  }

  test("q45 oracle SQL is structurally sound (13 phases x 5 steps)") {
    structurallySound(XxhWalkSql.q45Sql(Tables.ratingsSql), 13, 5)
  }

  test("q42 oracle SQL is structurally sound (16 phases x 4 steps)") {
    val sql = XxhWalkSql.q42Sql(Tables.ratingsSql)
    structurallySound(sql, 16, 4)
    // both chains present: class draw (h) and within-class index (h2)
    assert(sql.contains("w.h2") && sql.contains("list_filter"))
  }

  test("oracle SQL embeds the XXH64 prime constants, not placeholders") {
    val sql = XxhWalkSql.q45Sql(Tables.ratingsSql)
    // unsigned decimal forms of the public xxHash primes (P5 appears
    // only pre-combined with the hashed-byte-length constant: +8 for
    // hashLong, +4 for hashInt)
    for (p <- Seq("11400714785074694791", "14029467366897019727",
                  "1609587929392839161", "9650029242287828579",
                  "2870177450012600269", "2870177450012600265"))
      assert(sql.contains(p), s"missing prime $p")
  }
}
