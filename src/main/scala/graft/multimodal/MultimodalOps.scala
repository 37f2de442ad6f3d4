package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (driver mandate): image/audio/video as
  * opaque `binary` columns with typed metadata. The Spark-side shape —
  * schema, partition sizing, per-partition batch decode — is real and
  * tested. IMAGE decode is real (JDK-only `javax.imageio`, see
  * [[decodeImage]]); audio/video stay STUBBED (no codec libraries in
  * this container) behind [[MultimodalOps.decodeStub]], which produces
  * a deterministic fake feature vector from the bytes. Swap
  * `decodeStub` for a JNI/FFI codec without touching the plumbing — or
  * use the WORKING PySpark `mapInPandas` recipe in
  * `python/multimodal_decode.py` (same schema in/out, Pillow/soundfile
  * codecs, per-partition init, Arrow batch sizing) on a cluster that
  * has the codec libraries.
  */
object MultimodalOps {

  // ImageIO's default stream cache is a DISK temp file per
  // encode/decode call — create+write+delete syscalls paid once per
  // image on both the read and write paths. These are small in-memory
  // byte arrays; cache in heap instead. (JVM-global, set once at first
  // use of this object; executors initialize it per-JVM on first task.)
  javax.imageio.ImageIO.setUseCache(false)

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

  /** REAL image decode, JDK-only: `javax.imageio` parses the container
    * (PNG/JPEG/GIF/BMP), then features pool per-channel pixel sums in
    * row-major stride-`dim` buckets — feature i = (Σ of r+g+b at pixel
    * positions ≡ i mod dim) / (3·255). Integer accumulation with one
    * final division keeps the pooling exactly replayable from known
    * pixel values (the q65 oracle recomputes it in SQL). Returns None
    * when the bytes are not a decodable image — callers fall back to
    * [[decodeStub]], which keeps text-derived fixtures (q38) intact. */
  def decodeImage(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    // NonFatal, not just IOException: the JDK readers throw
    // IllegalArgumentException / index errors on bytes that carry a
    // valid magic number but a malformed body (fuzzed or truncated
    // images, text that happens to start with 'GIF89a') — the contract
    // is "undecodable → None → caller falls back", never a failed task
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { bi =>
      val acc = new Array[Long](dim)
      var idx = 0
      var y = 0
      while (y < bi.getHeight) {
        var x = 0
        while (x < bi.getWidth) {
          val rgb = bi.getRGB(x, y)
          acc(idx % dim) += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          idx += 1; x += 1
        }
        y += 1
      }
      acc.map(s => (s / (3.0 * 255.0)).toFloat)
    }
  }

  /** Deterministic 8-bit gray synthetic PNG: pixel p (row-major) of
    * image `id` has gray level `(id·31 + p) mod 256` in all three
    * channels. Paired with [[decodeImage]] it puts the encode→decode
    * roundtrip under an exact SQL oracle (q65): the pooled features are
    * a pure integer function of (id, w, h, dim) a SQL engine can
    * recompute without any codec. */
  def syntheticPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0
    while (p < w * h) {
      val g = ((id * 31 + p) % 256).toInt
      bi.setRGB(p % w, p / w, (g << 16) | (g << 8) | g)
      p += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", out)
    out.toByteArray
  }

  /** Per-partition batch decode: the mapPartitions boundary is where a
    * real codec stack amortizes library/model init per partition —
    * exactly the batch shape `mapInPandas` gives on the Python surface.
    * Image rows go through the real [[decodeImage]]; non-image kinds
    * (and image rows whose bytes aren't a decodable image, e.g. the
    * text-derived test fixtures) take the deterministic stub. */
  def extractFeatures(media: Dataset[Media], dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init would go here (codec handles, model weights)
      it.map { m =>
        val feats =
          if (m.kind == "image") decodeImage(m.content, dim).getOrElse(decodeStub(m.content, dim))
          else decodeStub(m.content, dim)
        MediaFeatures(m.id, m.kind, m.content.length, feats)
      }
    }
  }

  /** ViT-style patch features under a REAL decode: split the decoded
    * image into `patch`×`patch` tiles (row-major patch index over a
    * ⌈w/patch⌉×⌈h/patch⌉ grid) and emit EXACT-INTEGER per-patch
    * channel-sum statistics — the patchify step every vision
    * transformer pipeline runs before embedding, kept in integers so
    * a codec-free oracle can replay it from the synthetic pixel
    * formula (the q65 scheme: any decode or indexing defect breaks
    * the hash). Non-decodable rows are dropped (production patchify
    * runs after the media-type gate).
    * @return (id, patch_idx, sum_rgb, min_rgb, max_rgb) with
    *         rgb = r + g + b per pixel */
  def patchFeatures(media: Dataset[Media], patch: Int): DataFrame = {
    require(patch >= 1, "patchFeatures: patch >= 1")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val img =
          try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.content)))
          catch { case _: Throwable => None }
        img.toSeq.flatMap { bi =>
          val (w, h) = (bi.getWidth, bi.getHeight)
          val cols = (w + patch - 1) / patch
          val rows = (h + patch - 1) / patch
          for (py <- 0 until rows; px <- 0 until cols) yield {
            var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
            var y = py * patch
            while (y < math.min((py + 1) * patch, h)) {
              var x = px * patch
              while (x < math.min((px + 1) * patch, w)) {
                val rgb = bi.getRGB(x, y)
                val v = ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            (m.id, py * cols + px, sum, mn, mx)
          }
        }
      }
    }.toDF("id", "patch_idx", "sum_rgb", "min_rgb", "max_rgb")
  }

  /** REAL image resize, JDK-only: decode via [[decodeImage]]'s reader,
    * explicit nearest-neighbor pixel loop (src = (x·srcW/dstW,
    * y·srcH/dstH), integer floor — deliberately NOT Graphics2D
    * interpolation, whose rounding is implementation-defined; the NN
    * map is exact integer arithmetic a SQL oracle can replay), PNG
    * re-encode. None when the bytes aren't a decodable image. */
  def resizeNearest(bytes: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    require(dstW > 0 && dstH > 0)
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { src =>
      val out = new java.awt.image.BufferedImage(dstW, dstH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < dstH) {
        val sy = y * src.getHeight / dstH
        var x = 0
        while (x < dstW) {
          out.setRGB(x, y, src.getRGB(x * src.getWidth / dstW, sy) & 0xffffff)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** 64-bit perceptual average-hash (aHash) of an image — the
    * image-dedup primitive (near-duplicate images agree on most bits;
    * pair with [[graft.functions.HammingDist]] / the banded-Hamming
    * join exactly as SimHash text dedup does). REAL decode, then an
    * 8×8 nearest-neighbor downsample with [[resizeNearest]]'s integer
    * NN map, per-pixel luminance v = r+g+b, and bit p set iff
    * 64·v_p > Σv — the strict integer inequality replaces the usual
    * float mean so a SQL oracle replays every bit (q102). Emitted as a
    * 64-char bit string (the SimHash house style — portable, no
    * signed-hex pitfalls). None when the bytes aren't a decodable
    * image. */
  def aHash64(bytes: Array[Byte]): Option[String] = {
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.map { src =>
      val v = new Array[Long](64)
      var total = 0L
      var p = 0
      while (p < 64) {
        val x = (p % 8) * src.getWidth / 8
        val y = (p / 8) * src.getHeight / 8
        val rgb = src.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)).toLong
        v(p) = lum; total += lum; p += 1
      }
      val sb = new java.lang.StringBuilder(64)
      p = 0
      while (p < 64) { sb.append(if (v(p) * 64 > total) '1' else '0'); p += 1 }
      sb.toString
    }
  }

  /** (id, phash) for every media row — per-partition batch boundary
    * like [[extractFeatures]]; null phash when undecodable. */
  def perceptualHashes(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(m => (m.id, aHash64(m.content).orNull))
    }.toDF("id", "phash")
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
