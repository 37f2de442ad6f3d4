package graft.stream

import graft.text.Dedup.{MinhashA, MinhashP}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental (streaming) MinHash-LSH near-duplicate detection: the
  * ingest-time form of [[graft.text.Dedup.lshAnchorPairs]]. Every
  * (band, bucket) keeps ONE anchor document as state; each later
  * arrival in the bucket emits a (anchor, arrival, band) candidate
  * pair. This is how a corpus pipeline dedups against everything
  * already ingested without re-scanning it — state is one long per
  * occupied bucket, bounded by corpus cardinality, not corpus size.
  *
  * Semantics contract (spec-pinned): fed in doc_id order, the emitted
  * pairs equal the batch `lshAnchorPairs` (whose anchor is min doc_id
  * per bucket). In batch mode (`candidatePairs` over a non-streaming
  * Dataset) each bucket group is sorted by doc_id before emission, so
  * batch == relational holds unconditionally — q94 runs THIS kernel in
  * batch mode against an independent DuckDB replay of the whole
  * minhash/banding chain, putting the state machine under the oracle
  * gate, not just specs.
  *
  * Pairs are candidate-level (no exact-Jaccard recheck): a stream
  * cannot cheaply re-read the anchor's text. Production recheck is a
  * downstream batch join of the pair stream against the corpus —
  * exactly [[graft.text.Dedup.minhashLsh]]'s verification stage.
  */
object StreamingDedup {

  case class BucketedDoc(doc_id: Long, b: Int, bucket: String)
  case class CandPair(doc_a: Long, doc_b: Long, b: Int)

  /** Per-(doc, band) bucket keys computed NARROWLY — per-row array
    * folds over the document's own shingle set, zero aggregation — so
    * the plan is stateless-stage-only and legal upstream of a stateful
    * operator in a stream. Keys are identical to
    * [[graft.text.Dedup.bandBuckets]] (same shingling, same md5 48-bit
    * parse, same affine family), serialized as "b:h1:..:hr". */
  def bucketed(docs: DataFrame, nBands: Int, shingleK: Int,
               rowsPerBand: Int = 2, textCol: String = "text"): DataFrame = {
    val nHash = nBands * rowsPerBand
    require(nBands >= 1 && rowsPerBand >= 1 && nHash <= MinhashA.length,
      s"nBands*rowsPerBand must be in [1,${MinhashA.length}], got $nBands*$rowsPerBand")
    val buckets = (0 until nBands).map { b =>
      val hs = (0 until rowsPerBand).map { r =>
        val j = b * rowsPerBand + r
        s"array_min(transform(__x, v -> (${MinhashA(j)}L * v + ${j}L) % ${MinhashP}L))"
      }
      s"concat_ws(':', '$b', ${hs.mkString(", ")})"
    }
    // r15: shingle construction through the zero-copy WordShingles
    // kernel (spec-pinned equal to the old transform+concat_ws form);
    // the size filter keeps the old `size(w) >= k` semantics — an
    // empty shingle set would array_min to NULL bucket keys
    docs.select(col("doc_id"),
        graft.functions.WordShingles.of(lower(col(textCol)), shingleK).as("__sh"))
      .filter(size(col("__sh")) >= 1)
      .withColumn("__x", expr(
        "transform(__sh, s -> cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint))"))
      .select(col("doc_id"), posexplode(array(buckets.map(expr): _*)))
      .toDF("doc_id", "b", "bucket")
  }

  /** The stateful anchor kernel. State per bucket: the anchor doc_id
    * (first arrival; ties within a trigger broken by MIN doc_id — a
    * single min scan, which makes batch mode deterministic and equal
    * to the relational form as a SET; emission order within a bucket
    * is arrival order, not sorted). Works identically over a streaming
    * or batch Dataset.
    *
    * Memory: once a bucket has its anchor (the streaming steady state),
    * the group streams through with O(1) memory. Only a bucket's FIRST
    * batch buffers — the min scan needs one pass, the emission another.
    * In batch mode that first batch is the whole bucket, so a
    * pathologically hot bucket belongs on the relational
    * [[graft.text.Dedup.lshAnchorPairs]] (spillable window sort), which
    * is the documented batch-scale path; this kernel's batch mode
    * exists to put the state machine under the q94 oracle. */
  def candidatePairs(buckets: Dataset[BucketedDoc]): Dataset[CandPair] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(d => d.bucket)
      .flatMapGroupsWithState[Long, CandPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, it: Iterator[BucketedDoc], state: GroupState[Long]) =>
          state.getOption match {
            case Some(anchor) => // steady state: pure streaming pass
              it.filter(_.doc_id != anchor)
                .map(d => CandPair(anchor, d.doc_id, d.b))
            case None =>
              val docs = it.toArray
              var anchor = docs.head.doc_id
              var i = 1
              while (i < docs.length) {
                if (docs(i).doc_id < anchor) anchor = docs(i).doc_id
                i += 1
              }
              state.update(anchor)
              val a = anchor
              docs.iterator.filter(_.doc_id != a)
                .map(d => CandPair(a, d.doc_id, d.b))
          }
      }
  }

  /** bucketed → candidatePairs, typed end-to-end. */
  def candidates(docs: DataFrame, nBands: Int, shingleK: Int,
                 rowsPerBand: Int = 2): Dataset[CandPair] = {
    import docs.sparkSession.implicits._
    candidatePairs(bucketed(docs, nBands, shingleK, rowsPerBand).as[BucketedDoc])
  }
}
