"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Model: a media item is ``(media_id, kind, content: binary,
meta: struct<mime, width, height, duration_ms, sample_rate>)``.
Transformations run as Arrow-batched ``mapInPandas`` — the Spark
plumbing (schemas, batch iteration, partition parallelism, output
contracts) is real and tested; the *codec* step is stubbed because
this container ships no image/audio libraries:

- :func:`decode_image` raises ``NotImplementedError`` unless given a
  ``decoder`` callable (dependency injection point for PIL/ffmpeg);
- :func:`fake_decode` is the deterministic stand-in used by tests —
  it "decodes" the deterministic header format produced by
  :func:`synthesize_media` (a length-prefixed pseudo image).

Scale: mapInPandas streams Arrow record batches — constant memory per
task, no driver involvement; binary payloads stay off the driver. At
100 TB the media table partitions by (kind, bucket(media_id)) so
decode fan-out is embarrassingly parallel and a single kind can be
targeted without scanning the rest.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, content BINARY, "
    "meta STRUCT<mime: STRING, width: INT, height: INT, "
    "duration_ms: INT, sample_rate: INT>"
)

FEATURE_SCHEMA = (
    "media_id LONG, kind STRING, n_bytes INT, checksum STRING, "
    "width INT, height INT, feature ARRAY<FLOAT>"
)


def synthesize_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table derived from the documents
    fixture: content = 'IMG|<w>|<h>|' header + text bytes. Stands in
    for a real binary media column with plausible sizes."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w = (F.col("doc_id") % 64 + 16).cast("int")
    h = (F.col("doc_id") % 48 + 16).cast("int")
    header = F.concat_ws("|", F.lit("IMG"), w, h, F.lit(""))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.concat(header, F.col("text")), "utf-8").alias("content"),
        F.struct(
            F.lit("image/x-fake").alias("mime"),
            w.alias("width"),
            h.alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def synthesize_video_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake VIDEO table (content = header + text bytes,
    duration derived from doc_id) — drives the frame-sample fan-out
    path the way :func:`synthesize_media` drives image decode."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    dur = (F.col("doc_id") % 20 * 1000 + 500).cast("int")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.encode(F.concat(F.lit("VID|"), F.col("text")), "utf-8").alias(
            "content"
        ),
        F.struct(
            F.lit("video/x-fake").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            dur.alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def fake_decode(content: bytes) -> dict[str, Any]:
    """Deterministic stand-in decoder for the synthesize_media format.

    Real deployments inject a PIL/ffmpeg-backed callable with the same
    contract: bytes → {width, height, pixels: list[float]}.
    """
    head = content[:32].split(b"|")
    if head[0] != b"IMG":
        raise ValueError("not a fake image")
    w, h = int(head[1]), int(head[2])
    body = content[len(b"IMG||") + len(head[1]) + len(head[2]) + 1 :]
    # "pixels": normalized byte values, truncated/padded to 16 — a
    # deterministic fake for the resize+embed step.
    px = [b / 255.0 for b in body[:16]]
    px += [0.0] * (16 - len(px))
    return {"width": w, "height": h, "pixels": px}


def decode_image(content: bytes, decoder: Callable | None = None) -> dict[str, Any]:
    """Codec seam. No image library ships in this container, so calling
    without an injected decoder raises — deliberately loud, per the
    stub-the-codec / keep-the-plumbing-real contract."""
    if decoder is None:
        raise NotImplementedError(
            "no image codec available in this environment; inject one "
            "(e.g. PIL.Image.open-based) or use fake_decode for tests"
        )
    return decoder(content)


def extract_features(
    media: DataFrame, decoder: Callable[[bytes], dict[str, Any]] = fake_decode
) -> DataFrame:
    """media table → per-item features via Arrow-batched mapInPandas.

    Output: (media_id, kind, n_bytes, checksum, width, height,
    feature array<float>). The UDF processes whole record batches —
    the per-item Python cost is the decoder call only.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["content"].map(len).astype("int32"),
                "checksum": pdf["content"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
            decoded = pdf["content"].map(decoder)
            out["width"] = decoded.map(lambda d: d["width"]).astype("int32")
            out["height"] = decoded.map(lambda d: d["height"]).astype("int32")
            out["feature"] = decoded.map(lambda d: d["pixels"])
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, FEATURE_SCHEMA)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode pipeline under the driver's oracle gate:
    synthesize the binary media table from ``documents``, run the
    Arrow-batched ``mapInPandas`` feature extraction with the
    deterministic fake decoder, and emit the SQL-expressible outputs
    (byte length, md5 checksum, decoded dimensions). The oracle
    recomputes the same header+text bytes in DuckDB — so the batch
    plumbing (binary schema, Arrow transfer, batch iteration, UDF
    output contract) is verified end-to-end, not just unit-tested."""
    feats = extract_features(synthesize_media(spark, sf_dir))
    return feats.select(
        "media_id", "kind", "n_bytes", "checksum", "width", "height"
    ).orderBy("media_id")


ORACLES: dict[str, str] = {
    "multimodal_features": """
        WITH m AS (
            SELECT doc_id AS media_id,
                   'image' AS kind,
                   'IMG|' || (doc_id % 64 + 16) || '|'
                          || (doc_id % 48 + 16) || '|' || text AS payload,
                   CAST(doc_id % 64 + 16 AS INT) AS width,
                   CAST(doc_id % 48 + 16 AS INT) AS height
            FROM documents
        )
        SELECT media_id, kind,
               CAST(octet_length(encode(payload)) AS INT) AS n_bytes,
               md5(payload) AS checksum,
               width, height
        FROM m
        ORDER BY media_id
    """,
}

QUERIES = {
    "multimodal_features": q_multimodal_features,
}


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expand each video item into frame
    timestamps (pure Column exprs; the decode of each frame is the
    stubbed codec seam). Demonstrates the explode-based fan-out that a
    real frame extractor would parallelize over."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
