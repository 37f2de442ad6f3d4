package graft

import graft.functions.WordShingles
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.WordShingles]] bit-equal to the composable
  * split→transform→concat_ws(→array_distinct) form it replaced (r15) —
  * the exactness contract the minhash/dedup family and the curation
  * gate's repetition signal now stand on. */
class WordShinglesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** The pre-r15 composable form, verbatim. */
  private def referenceShingles(k: Int, distinct: Boolean) = {
    val grams = (0 until k).map(j => s"element_at(w, i + $j)").mkString(", ")
    val t = s"transform(sequence(1, size(w) - ${k - 1}), i -> concat_ws(' ', $grams))"
    expr(s"if(size(w) >= $k, ${if (distinct) s"array_distinct($t)" else t}, cast(array() as array<string>))")
  }

  private val adversarial = Seq(
    "a b c d e",
    "a a a a a",                       // all-duplicate grams
    "a  b c",                          // double space -> empty token
    " leading and trailing ",          // boundary empties
    "",                                // empty text -> one empty token
    "   ",                             // only spaces -> 4 empty tokens
    "one",                             // fewer tokens than k
    "ONE TWO Three two three TWO Three two", // lowercase collisions
    "héllo wörld héllo wörld naïve",   // multi-byte UTF-8
    "a b a b a b a b",                 // period-2 repetition
    "x\ty z",                          // tab is NOT a separator
    "a b c a b c a b c d"
  )

  test("WordShingles == split+transform+concat_ws(+array_distinct), k=2/3, both modes") {
    val df = adversarial.toDF("text")
      .select(col("text"), split(lower(col("text")), " ").as("w"))
    for (k <- Seq(2, 3); distinct <- Seq(true, false)) {
      val got = df.select(col("text"),
        WordShingles.of(lower(col("text")), k, distinct).as("g")).collect()
      val want = df.select(col("text"),
        referenceShingles(k, distinct).as("g")).collect()
      got.zip(want).foreach { case (g, w) =>
        assert(g.getSeq[String](1) == w.getSeq[String](1),
          s"k=$k distinct=$distinct text=${g.getString(0)}")
      }
    }
  }

  test("WordShingles matches on random word soup (seeded)") {
    val rnd = new scala.util.Random(42)
    val words = Seq("a", "b", "cc", "ddd", "", "Uppercase", "ümlaut")
    val texts = (0 until 200).map { _ =>
      (0 until rnd.nextInt(30)).map(_ => words(rnd.nextInt(words.size))).mkString(" ")
    }
    val df = texts.toDF("text")
      .select(col("text"), split(lower(col("text")), " ").as("w"))
    val got = df.select(WordShingles.of(lower(col("text")), 3).as("g"))
      .collect().map(_.getSeq[String](0))
    val want = df.select(referenceShingles(3, distinct = true).as("g"))
      .collect().map(_.getSeq[String](0))
    assert(got.toSeq == want.toSeq)
  }

  test("WordShingles stays codegen-compatible (no fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = adversarial.toDF("text")
        .select(explode(WordShingles.of(lower(col("text")), 3)).as("s"))
        .count()
      assert(n > 0)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }
}
