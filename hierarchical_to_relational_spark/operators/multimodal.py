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


def decode_and_featurize(df: DataFrame, deterministic_fake: bool = False, dim: int = 8) -> DataFrame:
    """Decode + feature-extract media blobs via Arrow-batched mapInPandas.

    The decode step is a stub: real deployments plug a library call into
    ``_featurize_batch``; the distributed plumbing (schema, Arrow batches,
    partitioning) is identical either way.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not deterministic_fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present in "
                    "this environment; pass deterministic_fake=True for the "
                    "reproducible stand-in feature extractor"
                )
            feats, shas, nbytes = [], [], []
            for content in pdf["content"]:
                raw = bytes(content) if content is not None else b""
                digest = hashlib.sha256(raw).digest()
                shas.append(digest.hex())
                nbytes.append(len(raw))
                feats.append([b / 255.0 for b in digest[:dim]])
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
