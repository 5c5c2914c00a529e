"""Multimodal plumbing: binary media table with REAL container bytes,
stdlib header parser, Arrow-batched feature extraction, frame-sample
fan-out. Golden container bytes in the unit tests are packed with
Python ``struct`` independently of the SQL hex constructors, so a bug
in either side fails the cross-check."""

from __future__ import annotations

import hashlib
import struct
import zlib

import pytest

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wd2duckdb_spark.functions.multimodal import (
    decode_image,
    extract_features,
    fake_decode,
    frame_sample_plan,
    header_decode,
    parse_media_header,
    synthesize_media,
    synthesize_mixed_media,
)


def _golden_bmp(w: int, h: int, payload: bytes) -> bytes:
    return (
        b"BM"
        + struct.pack("<IHHI", 54 + len(payload), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload),
                      2835, 2835, 0, 0)
        + payload
    )


def _golden_png(w: int, h: int, payload: bytes) -> bytes:
    ihdr = b"IHDR" + struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + ihdr
        + struct.pack(">I", zlib.crc32(ihdr))
        + payload
    )


def _golden_gif(w: int, h: int, payload: bytes) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\xf7\x00\x00" + payload


def _golden_jpeg(w: int, h: int, payload: bytes) -> bytes:
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes.fromhex(
        "011100021101031101"
    )
    return (
        b"\xff\xd8\xff\xe0"
        + struct.pack(">H", 2 + len(app0))
        + app0
        + b"\xff\xc0"
        + struct.pack(">H", 2 + len(sof))
        + sof
        + payload
    )


def _golden_wav(rate: int, payload: bytes) -> bytes:
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )


def test_parse_media_header_golden_containers():
    px = b"pixeldata-0123456789"
    bmp = parse_media_header(_golden_bmp(33, 21, px))
    assert (bmp["mime"], bmp["width"], bmp["height"], bmp["data_offset"]) == (
        "image/bmp", 33, 21, 54
    )
    png = parse_media_header(_golden_png(640, 480, px))
    assert (png["mime"], png["width"], png["height"]) == ("image/png", 640, 480)
    gif = parse_media_header(_golden_gif(12, 7, px))
    assert (gif["mime"], gif["width"], gif["height"]) == ("image/gif", 12, 7)
    wav = parse_media_header(_golden_wav(16000, b"x" * 64000))
    assert (wav["mime"], wav["sample_rate"], wav["duration_ms"]) == (
        "audio/wav", 16000, 2000
    )
    # JPEG: SOI + APP0 stub + SOF0 carrying the dimensions
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11)
        + struct.pack(">BHHB", 8, 99, 101, 3) + b"\x00\x00\x00"
    )
    j = parse_media_header(jpeg)
    assert (j["mime"], j["width"], j["height"]) == ("image/jpeg", 101, 99)
    with pytest.raises(ValueError):
        parse_media_header(b"\x00\x01unknown")


def test_media_schema_is_real_bmp(spark):
    m = synthesize_media(spark, SF_DIR)
    assert dict(m.dtypes)["content"] == "binary"
    row = m.filter(F.col("media_id") == 7).first()
    content = bytes(row["content"])
    assert row["kind"] == "image"
    assert row["meta"]["mime"] == "image/bmp"
    # byte-identical to the struct-packed golden BMP for the same doc
    text = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") == 7)
        .first()["text"]
    )
    assert content == _golden_bmp(7 % 64 + 16, 7 % 48 + 16, text.encode())


def test_mixed_media_matches_golden_bytes(spark):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 5)
        .collect()
    }
    rows = {
        r["media_id"]: bytes(r["content"])
        for r in synthesize_mixed_media(spark, SF_DIR)
        .filter(F.col("media_id") < 5)
        .collect()
    }
    for i, text in docs.items():
        w, h, payload = i % 64 + 16, i % 48 + 16, text.encode()
        golden = {
            0: _golden_png,
            1: _golden_gif,
            2: _golden_bmp,
            4: _golden_jpeg,
        }.get(i % 5)
        want = (
            golden(w, h, payload)
            if golden
            else _golden_wav(16000, payload)
        )
        assert rows[i] == want, f"doc {i} container bytes diverge"


def test_decode_without_codec_parses_headers():
    content = _golden_bmp(5, 3, bytes(range(32)))
    d = decode_image(content)  # no injected decoder: stdlib fallback
    assert (d["width"], d["height"]) == (5, 3)
    assert d["pixels"][:4] == [0.0, 1 / 255.0, 2 / 255.0, 3 / 255.0]
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01not-a-container")


def test_extract_features_roundtrip(spark):
    m = synthesize_media(spark, SF_DIR)
    feats = extract_features(m)
    assert feats.count() == m.count()
    row = feats.filter(F.col("media_id") == 7).first()
    src = m.filter(F.col("media_id") == 7).first()
    content = bytes(src["content"])
    assert row["n_bytes"] == len(content)
    assert row["checksum"] == hashlib.md5(content.hex().encode()).hexdigest()
    assert (row["width"], row["height"]) == (
        src["meta"]["width"], src["meta"]["height"]
    )
    assert len(row["feature"]) == 16
    want = header_decode(content)["pixels"]
    assert [round(float(x), 5) for x in row["feature"]] == [
        round(x, 5) for x in want
    ]


def test_fake_decode_legacy_format():
    d = fake_decode(b"IMG|4|2|abcd")
    assert (d["width"], d["height"]) == (4, 2)
    assert decode_image(b"IMG|4|2|abcd")["width"] == 4


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


def test_decode_wav_pcm_known_signal():
    """Hand-built WAV with known samples: the decoder must recover
    the exact sample count, energy, peak, and duration."""
    import struct as st

    import numpy as np

    from wd2duckdb_spark.functions.multimodal import decode_wav_pcm

    samples = np.array([0, 1000, -1000, 32767, -32768, 5], dtype="<i2")
    data = samples.tobytes()
    rate = 8000
    hdr = (
        b"RIFF" + st.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + st.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + st.pack("<I", len(data))
    )
    d = decode_wav_pcm(hdr + data)
    assert d["sample_rate"] == rate
    assert d["n_samples"] == 6
    assert d["sum_sq"] == int((samples.astype(np.int64) ** 2).sum())
    assert d["peak"] == 32768
    assert d["duration_ms"] == len(data) * 1000 // (rate * 2)

    import pytest

    with pytest.raises(ValueError):
        decode_wav_pcm(b"RIFX" + b"\x00" * 40)


def test_decode_bmp_pixels_bottom_up_rows():
    """Known 2x2 BMP: the decoder must honor bottom-up row storage —
    the top-left pixel comes from the LAST file row."""
    import struct as st

    from wd2duckdb_spark.functions.multimodal import decode_bmp_pixels

    w = h = 2
    stride = ((w * 3 + 3) // 4) * 4  # 8 bytes: 6 pixel + 2 pad
    # file row 0 (= image BOTTOM row): pixels (B,G,R) = (1,2,3),(4,5,6)
    # file row 1 (= image TOP row):    pixels (7,8,9),(10,11,12)
    rows = bytes([1, 2, 3, 4, 5, 6, 0, 0]) + bytes(
        [7, 8, 9, 10, 11, 12, 0, 0]
    )
    hdr = (
        b"BM" + st.pack("<I", 54 + len(rows)) + b"\x00" * 4
        + st.pack("<I", 54)
        + st.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
    )
    d = decode_bmp_pixels(hdr + rows)
    assert (d["width"], d["height"]) == (2, 2)
    assert (d["tl_b"], d["tl_g"], d["tl_r"]) == (7, 8, 9)  # top = 2nd file row
    # channel sums exclude the stride padding bytes
    assert (d["sum_b"], d["sum_g"], d["sum_r"]) == (1+4+7+10, 2+5+8+11, 3+6+9+12)
