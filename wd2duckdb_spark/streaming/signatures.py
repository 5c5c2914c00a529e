"""Incremental per-source MinHash signature maintenance: the
streaming face of :func:`~wd2duckdb_spark.functions.dedup
.q_source_overlap_sketch`.

A MinHash signature is a MERGEABLE sketch — ``min`` is associative,
commutative, and idempotent — so per-source signatures maintain
incrementally as document shards land: each micro-batch reduces its
own docs to (source, h0..h7) partials, and the true corpus signature
of a source is the component-wise ``min`` over all partials ever
written. No state store, no read-modify-write: partials append under
``batch=<id>`` (overwrite per batch — the replay-idempotence protocol
of ``dedup_ingest``), and because min-merge is idempotent, even a
DOUBLE-counted batch could not corrupt the merge — the layout only
needs replay protection to keep the directory tidy.

Scale: a batch partial is ≤ S rows × 8 longs (S = #sources), so the
signature table after B batches is ≤ B·S tiny rows; the merged view
is one ≤(B·S)-row aggregate — driver-trivial at any corpus size. This
is the sketch posture the exact matrix documents for thousands of
sources: contamination estimates come from sketch-to-sketch compares,
never from re-scanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wd2duckdb_spark.functions.dedup import (
    N_MINHASH,
    _minhash_cols,
    _source_shingles,
    overlap_from_signatures,
)

__all__ = [
    "source_signature_stream",
    "source_signatures",
    "overlap_from_signatures",
]


def _batch_signatures(batch_df: DataFrame, batch_id: int, sig_dir: str) -> None:
    """One micro-batch → its (source, h0..h7) partial signatures,
    written idempotently under ``batch=<id>`` (a replayed batch
    rewrites its own partition). Batches whose docs all have <3 tokens
    produce an empty partition — harmless to the merge."""
    sig = (
        _source_shingles(batch_df)
        .groupBy("source")
        .agg(*_minhash_cols())
    )
    (
        sig.coalesce(1)  # ≤ S rows — one small file per batch
        .write.mode("overwrite")
        .parquet(f"{sig_dir}/batch={batch_id}")
    )


def source_signature_stream(
    docs: DataFrame,
    sig_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Maintain per-source MinHash signatures over a streaming
    ``documents`` source; returns the StreamingQuery. Read the
    up-to-date merged signatures at any time with
    :func:`source_signatures` — no stream restart needed."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_signatures(batch_df, batch_id, sig_dir)

    return (
        docs.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
        if available_now
        else docs.writeStream.foreachBatch(_fn)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def source_signatures(spark, sig_dir: str) -> DataFrame:
    """Merged per-source signatures: component-wise min over every
    batch partial — identical to the batch tier's signature over the
    full corpus (pinned in tests/test_streaming.py), because min is a
    lossless merge for MinHash."""
    return (
        spark.read.parquet(sig_dir)
        .groupBy("source")
        .agg(*[F.min(f"h{i}").alias(f"h{i}") for i in range(N_MINHASH)])
    )


# overlap_from_signatures is re-exported from functions.dedup: the
# sketch-to-sketch compare of q_source_overlap_sketch, usable on
# streaming-maintained signatures without touching the corpus.
