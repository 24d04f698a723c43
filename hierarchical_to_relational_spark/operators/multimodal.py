"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery — schemas, partition-preserving transforms, UDF
signatures, batch shapes — is real and tested. The actual media decoding
is STUBBED (this container has no image/audio libraries): ``decode_stub``
raises ``NotImplementedError`` unless ``deterministic_fake=True``, in which
case it derives reproducible fake features from the bytes (so pipelines
and tests exercise the full distributed path).

Batch shape matters at scale: ``mapInPandas`` receives Arrow record
batches (``spark.sql.execution.arrow.maxRecordsPerBatch``); media blobs
are large, so callers should repartition by size, not rows, before heavy
extraction.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """JVM-side metadata over binary columns: byte length + sha2 digest —
    no Python, runs in the scan projection."""
    return df.withColumn("n_bytes", F.octet_length(F.col(content_col))).withColumn(
        "sha", F.sha2(F.col(content_col), 256)
    )


def image_decoder_available() -> bool:
    """True when an optional image library (Pillow) is importable — the
    real-decode path is gated on this, never assumed."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def decode_and_featurize(df: DataFrame, deterministic_fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + feature-extract media blobs via Arrow-batched mapInPandas.

    Three behaviors, same distributed plumbing (schema, Arrow batches,
    partitioning):

    - ``deterministic_fake=True``: reproducible stand-in features derived
      from the bytes (sha256 prefix) — what tests and this sandbox use.
    - real decode (default) when Pillow is importable on the executors:
      images are decoded and featurized as ``dim`` column-band grayscale
      means; non-image kinds fall back to the hash features.
    - otherwise ``NotImplementedError`` with a clear remediation hint.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        decoder = None
        if not deterministic_fake:
            try:
                from PIL import Image as decoder  # noqa: N813 (optional dep)
            except ImportError:
                raise NotImplementedError(
                    "media decoding requires an image library (Pillow) that is "
                    "not present in this environment; install pillow on the "
                    "executors, or pass deterministic_fake=True for the "
                    "reproducible stand-in feature extractor"
                ) from None

        def hash_feature(raw: bytes) -> list[float]:
            return [b / 255.0 for b in hashlib.sha256(raw).digest()[:dim]]

        def image_feature(raw: bytes) -> list[float]:
            import io

            img = decoder.open(io.BytesIO(raw)).convert("L").resize((dim, dim))
            px = list(img.getdata())  # row-major dim×dim grayscale
            return [sum(px[r * dim + c] for r in range(dim)) / dim / 255.0 for c in range(dim)]

        for pdf in batches:
            feats, shas, nbytes = [], [], []
            for content, kind in zip(pdf["content"], pdf["kind"]):
                raw = bytes(content) if content is not None else b""
                shas.append(hashlib.sha256(raw).hexdigest())
                nbytes.append(len(raw))
                if decoder is not None and kind == "image" and raw:
                    try:
                        feats.append(image_feature(raw))
                    except Exception:
                        # corrupt/unparseable blob: fall back to the hash
                        # feature instead of failing the task 4x and
                        # aborting the whole job for one bad row
                        feats.append(hash_feature(raw))
                else:
                    feats.append(hash_feature(raw))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": nbytes,
                    "sha": shas,
                    "feature": feats,
                }
            )

    return df.mapInPandas(_featurize, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (explode on a sequence — JVM-side; the actual frame grab is
    the stubbed decode step downstream)."""
    return (
        df.where(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))),
        )
        .select("media_id", "frame_ts_ms", "mime", "content")
    )
