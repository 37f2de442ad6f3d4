package graft

import graft.stream.EventStreams
import graft.text.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionAndClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Long) = new java.sql.Timestamp(minute * 60000)

  test("batch sessionization splits on the inactivity gap") {
    val events = Seq(
      (1L, ts(0), 1L, 1.0), (2L, ts(5), 1L, 2.0), (3L, ts(60), 1L, 3.0),
      (4L, ts(0), 2L, 1.0)
    ).toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.sessionizeBatch(events, 30 * 60000L)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    // user 1 session 1: events at 0 and 5 min
    assert(out(0).getLong(out(0).fieldIndex("n_events")) == 2)
    assert(out(0).getDouble(out(0).fieldIndex("total_value")) == 3.0)
    // user 1 session 2: the 60-min event alone
    assert(out(1).getLong(out(1).fieldIndex("n_events")) == 1)
  }

  test("per-window top-k ranks by count with id tie-break") {
    val events = (1 to 5).map(i => (i.toLong, ts(i), 7L, 1.0)) ++
      Seq((6L, ts(6), 8L, 1.0), (7L, ts(7), 9L, 1.0))
    val df = events.toDF("event_id", "ts", "user_id", "value")
    val out = EventStreams.topKPerWindow(df, "1 hour", 2).orderBy("rank").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 7L && out(0).getLong(2) == 5L) // most active
    assert(out(1).getLong(1) == 8L) // tie with 9 broken by id
  }

  test("dedup clusters: connected components over pair graph, min-id canonical") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = Dedup.clusters(spark, docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L) // one component
    assert(out(4L) == 4L && out(5L) == 5L) // singletons
  }

  test("canonical dedup keeps one min-id doc per cluster, singletons pass, broadcast semi-join") {
    val docs = Seq((1L, "a"), (2L, "a2"), (3L, "a3"), (4L, "b"), (5L, "c"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val cc = Dedup.clusters(spark, docs, pairs)
    val kept = Dedup.canonical(docs, cc)
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L, 5L))
    // the corpus side must not shuffle: the canonical id set broadcasts
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
    cc.unpersist(blocking = false)
  }

  test("leakageSafeSplit keeps whole clusters on one side, deterministically") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    val out = graft.text.Dedup.leakageSafeSplit(clusters, seed = 7L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out.size == 6)
    // all members of a cluster share their flag
    assert(Set(out(1L), out(2L), out(3L)).size == 1)
    assert(out(5L)._2 == out(6L)._2)
    // same seed reproduces; a different seed is a different draw overall
    val again = graft.text.Dedup.leakageSafeSplit(clusters, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(again == out.map { case (k, (_, t)) => k -> t })
    // flag matches the Sampling.shard arithmetic: bucket(cluster) == 0
    val buckets = graft.util.Sampling.shard(
      clusters.select("cluster_id").distinct().withColumnRenamed("cluster_id", "doc_id"),
      nShards = 5, seed = 7L, keyCols = Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1) == 0)).toMap
    out.foreach { case (_, (cl, t)) => assert(t == buckets(cl)) }
    intercept[IllegalArgumentException] {
      graft.text.Dedup.leakageSafeSplit(clusters, 7L, nBuckets = 1)
    }
  }

  test("multimodal stub features replay as integer byte sums") {
    // "ab" bytes 97,98: dim 2 -> f0 = 97/255, f1 = 98/255
    val f = graft.multimodal.MultimodalOps.decodeStub("ab".getBytes("UTF-8"), 2)
    assert(f(0) == (97 / 255.0).toFloat && f(1) == (98 / 255.0).toFloat)
  }
}
