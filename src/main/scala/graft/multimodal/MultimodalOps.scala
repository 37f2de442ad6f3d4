package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver mandate): image/audio/video as
  * opaque `binary` columns with typed metadata. The Spark-side shape —
  * schema, partition sizing, per-partition batch decode — is real and
  * tested; the actual codec call is STUBBED (no image/audio libraries
  * in this container) behind [[MultimodalOps.decodeStub]], which
  * produces a deterministic fake feature vector from the bytes. Swap
  * `decodeStub` for a JNI/FFI codec without touching the plumbing — or
  * use the WORKING PySpark `mapInPandas` recipe in
  * `python/multimodal_decode.py` (same schema in/out, Pillow/soundfile
  * codecs, per-partition init, Arrow batch sizing) on a cluster that
  * has the codec libraries.
  */
object MultimodalOps {

  case class Media(id: Long, kind: String, content: Array[Byte],
                   width: Int, height: Int, sampleRate: Int)
  case class MediaFeatures(id: Long, kind: String, n_bytes: Int, features: Array[Float])

  /** Attach a binary content column (here derived from text for test
    * data; production reads binary parquet/files directly). */
  def asMedia(docs: DataFrame, kind: String = "image"): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("id"), lit(kind).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit(64).as("width"), lit(64).as("height"), lit(0).as("sampleRate"))
      .as[Media]
  }

  /** === STUB === Real implementation would decode `content` with an
    * image/audio codec and emit pooled features. The deterministic fake
    * pools byte strides: feature i = (Σ of bytes at positions ≡ i mod
    * dim) / 255. Integer accumulation with one final division keeps it
    * exactly replayable by the SQL oracle (no float-order sensitivity). */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      acc(i % dim) += (bytes(i) & 0xff)
      i += 1
    }
    acc.map(s => (s / 255.0).toFloat)
  }

  /** Per-partition batch "decode": the mapPartitions boundary is where
    * a real codec would amortize model/library init per partition —
    * exactly the batch shape `mapInPandas` gives on the Python surface. */
  def extractFeatures(media: Dataset[Media], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map(m => MediaFeatures(m.id, m.kind, m.content.length, decodeStub(m.content, dim)))
    }
  }

  /** Frame sampling plumbing for video-kind rows: emits (id, frame_idx)
    * stride-sampled — the decode of each frame is the same stub. */
  def sampleFrames(media: Dataset[Media], everyN: Int): DataFrame = {
    media.toDF()
      .withColumn("n_frames", greatest((length(col("content")) / 1024).cast("int"), lit(1)))
      .withColumn("frame_idx", explode(expr(s"sequence(0, n_frames - 1, $everyN)")))
      .select(col("id"), col("frame_idx"))
  }
}
