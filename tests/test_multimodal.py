"""Multimodal binary-column plumbing: metadata, Arrow-batched featurize
stub, frame-sampling plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hierarchical_to_relational_spark.operators import multimodal as mm


def _media(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes"), 64, 64, None),
        (2, "audio", "audio/wav", bytearray(b"RIFF fake"), None, None, 2500),
        (3, "video", "video/mp4", bytearray(b"ftyp fake"), 640, 480, 3500),
        (4, "image", "image/png", None, None, None, None),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_binary_metadata_jvm_side(spark):
    out = mm.attach_binary_metadata(_media(spark))
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 15
    assert len(rows[1]["sha"]) == 64
    assert rows[4]["n_bytes"] is None


def test_featurize_stub_deterministic(spark):
    out = mm.decode_and_featurize(_media(spark), deterministic_fake=True, dim=4)
    assert out.schema == mm.FEATURE_SCHEMA
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert len(rows[1]["feature"]) == 4
    # re-run → identical features (deterministic stand-in)
    rows2 = {r["media_id"]: r for r in mm.decode_and_featurize(_media(spark), deterministic_fake=True, dim=4).collect()}
    assert rows[1]["feature"] == rows2[1]["feature"]
    assert rows[1]["sha"] == rows2[1]["sha"]


def test_featurize_without_libs_raises(spark):
    with pytest.raises(Exception, match="NotImplementedError|media decoding"):
        mm.decode_and_featurize(_media(spark)).collect()


def test_frame_sampling_plan(spark):
    out = mm.sample_frames(_media(spark), every_ms=1000)
    rows = sorted((r["media_id"], r["frame_ts_ms"]) for r in out.collect())
    assert rows == [(3, 0), (3, 1000), (3, 2000), (3, 3000)]


def test_real_decode_path_when_library_present(spark):
    """The real-decode branch is gated on an optional import: with Pillow
    present the same pipeline decodes actual image bytes (no fake flag);
    without it, the stub raises with a remediation hint. Same tests, both
    ways."""
    import pytest
    from hierarchical_to_relational_spark.operators.multimodal import (
        decode_and_featurize, image_decoder_available, MEDIA_SCHEMA,
    )

    if not image_decoder_available():
        pytest.skip("Pillow not installed in this environment (stub path "
                    "covered by test_decode_stub_raises_without_fake)")
    import io
    from PIL import Image

    buf = io.BytesIO()
    Image.new("L", (32, 32), color=128).save(buf, format="PNG")
    rows = [(1, "image", "image/png", bytearray(buf.getvalue()), 32, 32, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_and_featurize(df).collect()
    assert len(out) == 1
    feat = out[0]["feature"]
    assert len(feat) == 8 and all(abs(x - 128 / 255) < 0.02 for x in feat)
