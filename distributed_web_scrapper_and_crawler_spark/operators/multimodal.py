"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

The corpus records media spans (``media_ref``) that the reference never
fetches; a training-data pipeline does. This module supplies the
Spark-side plumbing for that path at 100 TB scale:

- a ``media`` table ``(media_ref, kind, content BINARY, meta STRUCT)``
  synthesized deterministically from the span documents (sandbox has no
  network — the payload generator is the fetch stand-in);
- ``mapInPandas`` operators whose batch shape, schema, and partitioning
  are real, with the actual codec behind an import-try: the container
  ships no PIL/ffmpeg, so decode falls back to a DETERMINISTIC fake
  (seeded from the content hash) and raises ``NotImplementedError`` only
  when ``strict=True``. Swapping in a real codec touches one function.

Scale notes: payloads stay in executor memory one Arrow batch at a
time (``maxRecordsPerBatch`` bounds batch bytes); feature extraction is
a narrow map — no shuffle; downstream ANN joins key on the feature
vector's LSH bucket (operators/ann.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.IntegerType()),
                    T.StructField("format", T.StringType()),
                ]
            ),
        ),
    ]
)


def media_table_from_corpus(spark: SparkSession, corpus: DataFrame) -> DataFrame:
    """Distinct media refs -> deterministic fake payloads (the "fetch")."""
    refs = (
        corpus.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )

    def gen(it):
        for pdf in it:
            rows = []
            for ref in pdf["media_ref"]:
                seed = hashlib.md5(ref.encode()).digest()
                rng = np.random.RandomState(np.frombuffer(seed[:4], dtype=np.uint32)[0])
                n = int(rng.randint(256, 2048))
                content = rng.bytes(n)
                rows.append(
                    {
                        "media_ref": ref,
                        "kind": "image",
                        "content": content,
                        "meta": {
                            "width": int(rng.randint(16, 256)),
                            "height": int(rng.randint(16, 256)),
                            "n_bytes": n,
                            "format": "fake/raw",
                        },
                    }
                )
            yield pd.DataFrame(rows, columns=["media_ref", "kind", "content", "meta"])

    return refs.mapInPandas(gen, MEDIA_SCHEMA)


def _try_real_decode(content: bytes):
    """The real-codec seam: returns pixels if an image lib is present."""
    try:  # pragma: no cover - image libs absent in this container
        from PIL import Image  # type: ignore
        import io

        return np.asarray(Image.open(io.BytesIO(content)))
    except ImportError:
        return None


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def extract_media_features(media: DataFrame, dim: int = 16, strict: bool = False) -> DataFrame:
    """content BINARY -> feature vector, one Arrow batch at a time.

    Real pipeline: decode -> resize -> embed. Here decode is stubbed:
    without an image lib the feature is a deterministic hash-seeded
    vector (stable across runs/partitionings => testable), and
    ``decode_ok`` records that the fake path ran. ``strict=True`` turns
    the missing codec into NotImplementedError instead.
    """

    def per_batch(it):
        for pdf in it:
            feats, oks = [], []
            for content in pdf["content"]:
                pixels = _try_real_decode(bytes(content))
                if pixels is None:
                    if strict:
                        raise NotImplementedError(
                            "no image codec in this environment; install PIL or run strict=False"
                        )
                    seed = hashlib.md5(bytes(content)).digest()
                    rng = np.random.RandomState(np.frombuffer(seed[:4], dtype=np.uint32)[0])
                    feats.append(rng.rand(dim).astype(np.float32))
                    oks.append(False)
                else:  # pragma: no cover
                    v = pixels.astype(np.float32).ravel()
                    v = np.resize(v, dim) / 255.0
                    feats.append(v)
                    oks.append(True)
            yield pd.DataFrame(
                {"media_ref": pdf["media_ref"], "feature": feats, "decode_ok": oks}
            )

    return media.select("media_ref", "content").mapInPandas(per_batch, FEATURES_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index,
    computed from metadata only (decode stubbed). Shows the explode shape
    a real ffmpeg-backed sampler would produce."""
    n_frames = (F.col("meta.n_bytes") / 64).cast("int")
    return (
        media.filter(F.col("kind").isin("video", "image"))
        .select(
            "media_ref",
            F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))).alias(
                "frame_idx"
            ),
        )
    )
