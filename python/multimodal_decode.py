"""Real-codec counterpart of graft.multimodal.MultimodalOps (Scala).

The Scala side owns the plumbing — media schema, partition sizing, the
per-partition batch-decode boundary, frame sampling — and stubs only the
codec call (no image/audio libraries ship in the build container). This
file is the WORKING PySpark recipe that replaces the stub on a cluster
where Pillow / soundfile are installed: same schema in, same schema out,
so results drop into the Scala pipeline unchanged.

Run (any Spark 3.4+/4.x cluster with pyspark, pyarrow, pandas, numpy,
Pillow):

    spark-submit python/multimodal_decode.py <media.parquet> <out.parquet>

Design notes, mirrored from the Scala plumbing:
  - `mapInPandas` is the Python analogue of the Scala mapPartitions
    boundary: the codec (and any model weights) initialize ONCE per
    partition, then process Arrow record batches — not per row.
  - Batches arrive sized by spark.sql.execution.arrow.maxRecordsPerBatch
    (set below to keep decoded frames within executor memory: bytes per
    batch ~ maxRecordsPerBatch x avg media size x decode blow-up).
  - Output is a plain (id, kind, n_bytes, features: array<float>) frame,
    identical to MultimodalOps.MediaFeatures.
  - Failures yield a null features row instead of killing the stage
    (same policy as the reference's SPARQL worker: swallow-and-continue,
    worker.py:18-31).
"""

import io
import sys

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

OUT_SCHEMA = "id long, kind string, n_bytes int, features array<float>"
FEATURE_DIM = 8


def _decode_image(content: bytes, dim: int):
    """Image -> dim-dimensional pooled feature: resize to a dim-pixel
    strip, mean over channels. Replace with a real embedding model where
    needed — the plumbing does not change."""
    from PIL import Image

    img = Image.open(io.BytesIO(content)).convert("RGB").resize((dim, 1))
    arr = np.asarray(img, dtype=np.float32) / 255.0  # (1, dim, 3)
    return arr.mean(axis=2).ravel()  # (dim,)


def _decode_audio(content: bytes, dim: int):
    """Audio -> dim mean-pooled RMS windows over the first channel."""
    import soundfile as sf

    data, _rate = sf.read(io.BytesIO(content), dtype="float32", always_2d=True)
    mono = data[:, 0]
    if mono.size == 0:
        return np.zeros(dim, dtype=np.float32)
    windows = np.array_split(mono, dim)
    return np.array([float(np.sqrt(np.mean(w * w))) if w.size else 0.0
                     for w in windows], dtype=np.float32)


def decode_batches(batches):
    """mapInPandas body: one generator over Arrow batches per partition.
    Per-partition init happens HERE, before the loop — codec handles and
    model weights load once, exactly like the Scala mapPartitions stub's
    'per-partition init would go here' seam."""
    decoders = {"image": _decode_image, "audio": _decode_audio}
    for pdf in batches:
        feats = []
        for content, kind in zip(pdf["content"], pdf["kind"]):
            try:
                feats.append(decoders[kind](bytes(content), FEATURE_DIM).tolist())
            except Exception:
                feats.append(None)  # worker.py:18-31 policy: keep the row
        yield pd.DataFrame({
            "id": pdf["id"],
            "kind": pdf["kind"],
            # null-safe: a null blob must yield a 0-byte null-features
            # row, not a task-killing TypeError
            "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)).astype("int32"),
            "features": feats,
        })


def main(src: str, dst: str) -> None:
    spark = (
        SparkSession.builder.appName("graft-multimodal-decode")
        # bound Arrow batch size so maxRecordsPerBatch x media size x
        # decode blow-up fits executor memory (100 TB rule: size the
        # batch, not the partition count)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.parquet.columnarReaderBatchSize", "256")
        .getOrCreate()
    )
    media = spark.read.parquet(src)  # (id, kind, content, width, height, sampleRate)
    # column pruning BEFORE the python boundary: only ship what decodes
    out = (
        media.select("id", "kind", "content")
        .mapInPandas(decode_batches, schema=OUT_SCHEMA)
    )
    out.write.mode("overwrite").parquet(dst)
    # count failures from the WRITTEN output — filtering `out` would
    # re-run the whole decode pipeline a second time
    n_failed = spark.read.parquet(dst).filter(F.col("features").isNull()).count()
    print(f"decoded -> {dst} ({n_failed} failed rows kept as null)")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
