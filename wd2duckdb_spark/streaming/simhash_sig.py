"""Incremental per-document SimHash signature maintenance (VERDICT r8
item 6): the streaming face of
:func:`~wd2duckdb_spark.functions.dedup.q_simhash_hamming_pairs`,
closing the dedup-at-ingest gap for small EDITS — the ingest index
(``dedup_ingest``) catches exact and MinHash set-overlap duplicates,
but an edited near-copy needs SimHash's Hamming geometry.

SimHash's per-bit counters are MERGEABLE BY SUM: the signature is a
majority vote over per-bit counts of token hashes, and sums over
disjoint row sets add. So each micro-batch reduces its docs to
(doc_id, n, c0..c59) partials appended under ``batch=<id>``, and the
true corpus counters are the component-wise SUM over all partials —
no state store, no read-modify-write.

Replay protection — WEAKER algebra than the MinHash store, stated
honestly: ``min`` (signatures.py) is idempotent, so even a
double-counted batch could not corrupt that merge; ``sum`` is not.
Correctness here rests on the ``batch=<id>`` overwrite protocol (a
crash-replayed batch REWRITES its own partition, so each row is
counted exactly once), the same guarantee ``dedup_ingest`` relies on
— plus the archive's newest-batch refusal, which keeps a replayed
batch from racing a concurrent fold of its own partition.

Semantics note: a document SPLIT across micro-batches merges by
summed counters with per-chunk token distinctness (a token occurring
in two chunks counts twice) — the natural incremental semantics.
When each document arrives whole in one batch (the common shard
layout, and the batch-twin test's), the merged signatures are
bit-identical to the batch tier's.

Scale: a batch partial is ≤ rows(batch) × 62 longs; the merged view
is one doc-keyed sum aggregate — the same shuffle the batch tier
pays, amortized across batches. Band keys for probing come from the
shared :func:`~wd2duckdb_spark.functions.dedup.simhash_pairs`
machinery, so narrow/wide layouts apply unchanged to the
streaming-maintained store.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.functions.dedup import (
    SIMHASH_BANDS,
    SIMHASH_BITS,
    SIMHASH_HAMMING,
    counters_to_signature,
    simhash_bit_counts,
    simhash_candidates,
    simhash_pairs,
)

__all__ = [
    "simhash_signature_stream",
    "doc_signatures",
    "doc_band_keys",
    "stream_simhash_pairs",
    "archive_bit_counts",
]


def _batch_bit_counts(
    batch_df: DataFrame, batch_id: int, sig_dir: str
) -> None:
    """One micro-batch → its (doc_id, n, c0..c59) counter partials,
    written idempotently under ``batch=<id>`` (a replayed batch
    rewrites its own partition — the sum merge requires exactly-once
    per row, which this layout provides)."""
    (
        simhash_bit_counts(batch_df)
        .coalesce(1)  # one small file per batch
        .write.mode("overwrite")
        .parquet(f"{sig_dir}/batch={batch_id}")
    )


def simhash_signature_stream(
    docs: DataFrame,
    sig_dir: str,
    checkpoint: str,
    available_now: bool = True,
    archive_every: int | None = None,
):
    """Maintain per-document SimHash bit counters over a streaming
    ``documents`` source; returns the StreamingQuery. Read the merged
    signatures at any time with :func:`doc_signatures` — no stream
    restart needed. ``archive_every=N`` folds the store from inside
    the stream every N-th batch (serial foreachBatch callbacks — no
    concurrent writer), same protocol as
    ``signatures.source_signature_stream``."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_bit_counts(batch_df, batch_id, sig_dir)
        if archive_every and batch_id > 0 and batch_id % archive_every == 0:
            archive_bit_counts(
                batch_df.sparkSession, sig_dir, through_batch=batch_id - 1
            )

    writer = docs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _merged_counters(spark: SparkSession, sig_dir: str) -> DataFrame:
    return (
        spark.read.parquet(sig_dir)
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"c{j}").alias(f"c{j}") for j in range(SIMHASH_BITS)],
        )
    )


def doc_signatures(spark: SparkSession, sig_dir: str) -> DataFrame:
    """Merged per-document signatures: component-wise SUM over every
    batch partial, then the majority-vote finalize — identical to the
    batch tier's :func:`simhash_signatures` over the full corpus when
    docs arrive whole (pinned in tests/test_streaming.py)."""
    return counters_to_signature(_merged_counters(spark, sig_dir))


def doc_band_keys(
    spark: SparkSession,
    sig_dir: str,
    *,
    blocks: int = SIMHASH_BANDS,
    hamming: int = SIMHASH_HAMMING,
) -> DataFrame:
    """(doc_id, tbl, key) probe rows for the streaming-maintained
    store under any banding layout — what an ingest-time Hamming
    probe joins new docs against."""
    sig = doc_signatures(spark, sig_dir)
    # reuse the pair machinery's key builder via its candidate frame
    # contract: candidates are built FROM these keys, so expose them
    # by re-deriving on the signature frame
    from wd2duckdb_spark.functions.dedup import (
        _simhash_combo_key,
        _validate_simhash_banding,
        simhash_block_widths,
        simhash_tables,
    )

    _validate_simhash_banding(SIMHASH_BITS, blocks, hamming)
    widths = simhash_block_widths(SIMHASH_BITS, blocks)
    offsets = [sum(widths[:i]) for i in range(blocks)]
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("tbl"),
                _simhash_combo_key(
                    F.col("sim"), combo, widths, offsets
                ).alias("key"),
            )
            for t, combo in enumerate(simhash_tables(blocks, hamming))
        ]
    )
    return sig.select("doc_id", "sim", F.explode(entries).alias("e")).select(
        "doc_id", "sim", F.col("e.tbl").alias("tbl"), F.col("e.key").alias("key")
    )


def stream_simhash_pairs(
    spark: SparkSession,
    sig_dir: str,
    *,
    blocks: int = SIMHASH_BANDS,
    hamming: int = SIMHASH_HAMMING,
) -> DataFrame:
    """Exact Hamming ≤ ``hamming`` pairs over the streaming-maintained
    store — the batch twin of ``simhash_hamming_pairs`` on
    incrementally-built signatures (parity pinned in
    tests/test_streaming.py)."""
    return simhash_pairs(
        doc_signatures(spark, sig_dir), blocks=blocks, hamming=hamming
    )


def archive_bit_counts(
    spark: SparkSession, sig_dir: str, through_batch: int
) -> None:
    """Fold every ``batch=<id>`` partial with id ≤ ``through_batch``
    (and any existing archive) into ONE sum-merged ``batch=-1``
    archive partition — the counter-store twin of
    ``signatures.archive_signatures``, with the refusal guard doing
    REAL replay work here: sum is not idempotent, so the newest live
    batch (which a crash-restart would rewrite) must never be folded
    — folding it and then replaying it would double-count. Older
    batches are safe: their ``batch=<id>`` rewrites are byte-identical
    re-derivations, and once folded they no longer exist as separate
    partitions to replay over (the checkpoint has moved past them)."""
    from wd2duckdb_spark.maintenance import swap_in
    from wd2duckdb_spark.streaming.dedup_ingest import ARCHIVE_BATCH

    df = spark.read.parquet(sig_dir)
    batch_vals = sorted(
        r.batch for r in df.select("batch").distinct().collect()
    )
    live_vals = [b for b in batch_vals if b != ARCHIVE_BATCH]
    if not live_vals:
        raise ValueError(
            f"archive_bit_counts: {sig_dir} holds no live batch partials"
        )
    if through_batch >= live_vals[-1]:
        raise ValueError(
            f"archive_bit_counts: through_batch={through_batch} would "
            f"archive the most recent batch {live_vals[-1]}, which a "
            "restart may REPLAY — sum-merge would double-count it; pass "
            "through_batch < max batch id"
        )
    old = F.col("batch") <= through_batch  # includes batch=-1
    folded = (
        df.filter(old)
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n"),
            *[F.sum(f"c{j}").alias(f"c{j}") for j in range(SIMHASH_BITS)],
        )
        .withColumn("batch", F.lit(ARCHIVE_BATCH))
    )
    live = df.filter(~old)
    tmp = sig_dir.rstrip("/") + "._compact"
    backup = sig_dir.rstrip("/") + "._prearchive"
    (
        folded.unionByName(live)
        .coalesce(1)
        .write.mode("overwrite")
        .partitionBy("batch")
        .parquet(tmp)
    )
    swap_in(spark, sig_dir, tmp, backup, op="archive_bit_counts")


#: No registered queries: the streaming store's correctness contract
#: is batch-twin parity (tests/test_streaming.py pins merged
#: signatures == simhash_signatures and stream pairs ==
#: q_simhash_hamming_pairs); simhash_candidates is re-exported for
#: probe composition.
QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_ = simhash_candidates  # re-export for probe composition
