package graft

import graft.text.Keywords
import org.scalatest.funsuite.AnyFunSuite

/** tfidfRetrieve: exact driver recount (e3-integer weights), ranking
  * semantics, out-of-vocabulary handling, k cutoff, partition
  * invariance. */
class TfidfRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "hash join hash join order"),
    (2L, "join order by key"),
    (3L, "window scan merge scan"),
    (4L, "the quick brown fox"),
    (5L, "hash table lookup")
  ).toDF("doc_id", "text")

  private def recount(queries: Seq[(String, String)], k: Int): Map[(String, Long), Double] = {
    val rows = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val tf = rows.toSeq.flatMap { case (id, t) =>
      t.toLowerCase.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, xs) => (id, w, xs.length.toLong) }
    }
    val n = rows.size.toDouble
    val df = tf.groupBy(_._2).map { case (w, xs) => w -> xs.size }
    val idfE3 = df.map { case (w, d) =>
      w -> BigDecimal((math.log((n + 1.0) / (d + 1.0)) + 1.0) * 1e3)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val dv = tf.map { case (id, w, c) => (id, w, c * idfE3(w)) }
    val dn = dv.groupBy(_._1).map { case (id, xs) => id -> xs.map(x => x._3 * x._3).sum }
    queries.flatMap { case (qid, qtext) =>
      val qtf = qtext.toLowerCase.split(" ").filter(_.nonEmpty).groupBy(identity)
        .collect { case (w, xs) if idfE3.contains(w) => w -> xs.length * idfE3(w) }
      val nq = qtf.values.map(x => x * x).sum
      val scores = dv.groupBy(_._1).flatMap { case (id, xs) =>
        val num = xs.collect { case (_, w, wt) if qtf.contains(w) => qtf(w) * wt }.sum
        if (num == 0) None
        else Some((qid, id) -> BigDecimal(num.toDouble / (math.sqrt(dn(id).toDouble) * math.sqrt(nq.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      scores.toSeq.sortBy { case ((_, id), c) => (-c, id) }.take(k)
    }.toMap
  }

  test("exact agreement with the driver recount; k cutoff; ordering") {
    val qs = Seq(("q1", "hash join"), ("q2", "scan merge"))
    val got = Keywords.tfidfRetrieve(docs, qs, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == recount(qs, 3))
    // q1: doc 1 (hash x2, join x2) must outrank docs 2 and 5
    val q1 = got.filter(_._1._1 == "q1").toSeq.sortBy(-_._2).map(_._1._2)
    assert(q1.head == 1L && q1.toSet == Set(1L, 2L, 5L))
    // q2: only doc 3 contains scan/merge
    assert(got.keySet.filter(_._1 == "q2").map(_._2) == Set(3L))
  }

  test("out-of-vocabulary query terms drop; fully-OOV query returns nothing") {
    val got = Keywords.tfidfRetrieve(docs,
      Seq(("q1", "hash zzz-unknown"), ("q2", "zzz yyy")), k = 5).collect()
    assert(got.forall(_.getString(0) == "q1"))
    assert(got.map(_.getLong(1)).toSet == Set(1L, 5L))
  }

  test("partition invariance") {
    val qs = Seq(("q1", "join order"))
    val a = Keywords.tfidfRetrieve(docs, qs, 5).collect().map(_.toString).sorted.toSeq
    val b = Keywords.tfidfRetrieve(docs.repartition(7), qs, 5).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b)
  }
}
