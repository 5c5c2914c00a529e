"""Multimodal plumbing: binary media table, Arrow-batched feature
extraction (stubbed codec), frame-sample fan-out."""

from __future__ import annotations

import hashlib

import pytest

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wd2duckdb_spark.functions.multimodal import (
    decode_image,
    extract_features,
    fake_decode,
    frame_sample_plan,
    synthesize_media,
)


def test_media_schema(spark):
    m = synthesize_media(spark, SF_DIR)
    assert dict(m.dtypes)["content"] == "binary"
    row = m.filter(F.col("media_id") == 7).first()
    assert row["kind"] == "image"
    assert row["meta"]["mime"] == "image/x-fake"
    assert bytes(row["content"]).startswith(b"IMG|")


def test_decode_stub_is_loud():
    with pytest.raises(NotImplementedError):
        decode_image(b"IMG|1|1|x")


def test_extract_features_roundtrip(spark):
    m = synthesize_media(spark, SF_DIR)
    feats = extract_features(m)
    assert feats.count() == m.count()
    row = feats.filter(F.col("media_id") == 7).first()
    src = m.filter(F.col("media_id") == 7).first()
    content = bytes(src["content"])
    assert row["n_bytes"] == len(content)
    assert row["checksum"] == hashlib.md5(content).hexdigest()
    assert (row["width"], row["height"]) == (
        src["meta"]["width"], src["meta"]["height"]
    )
    assert len(row["feature"]) == 16
    want = fake_decode(content)["pixels"]
    assert [round(float(x), 5) for x in row["feature"]] == [
        round(x, 5) for x in want
    ]


def test_frame_sample_plan(spark):
    m = synthesize_media(spark, SF_DIR).limit(3)
    video = m.select(
        "media_id",
        F.lit("video").alias("kind"),
        "content",
        F.struct(
            F.lit("video/x-fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(3000).alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    frames = frame_sample_plan(video, every_ms=1000)
    # 0,1000,2000,3000 per video
    assert frames.count() == 3 * 4
    assert frames.groupBy("media_id").count().first()["count"] == 4


def test_frame_sample_plan_fanout(spark):
    """Each video expands to one row per sampled timestamp:
    floor(duration/step)+1 frames at 0, step, 2*step, ..."""
    from wd2duckdb_spark.functions.multimodal import (
        frame_sample_plan,
        synthesize_video_media,
    )

    v = synthesize_video_media(spark, SF_DIR)
    frames = frame_sample_plan(v, every_ms=1000)
    got = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["media_id"]: r["meta"]["duration_ms"] // 1000 + 1
        for r in v.select("media_id", "meta").collect()
    }
    assert got == want
    # frame timestamps are the arithmetic sequence, not arbitrary
    ts = sorted(
        r["frame_ts_ms"]
        for r in frames.filter(F.col("media_id") == 7).collect()
    )
    assert ts == list(range(0, 7 % 20 * 1000 + 500 + 1, 1000))
