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
    "simhash_ingest_stream",
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


# ---------------------------------------------------------------------------
# SimHash dedup AT ingest (VERDICT r9 item 6)
# ---------------------------------------------------------------------------


def _sig_banded_keys(
    sig: DataFrame, *, blocks: int, hamming: int
) -> DataFrame:
    """(doc_id, sim, tbl, key) probe rows for a signature frame —
    the same Manku combined-key layout :func:`simhash_candidates`
    joins on, exposed row-wise so an ingest index can persist and
    probe it."""
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
        "doc_id",
        "sim",
        F.col("e.tbl").alias("tbl"),
        F.col("e.key").alias("key"),
    )


def _history_hamming_dups(
    keys: DataFrame,
    seen: DataFrame,
    *,
    hamming: int,
    n_keys: int,
    probe_keys: list | None,
) -> DataFrame:
    """doc_ids of the current batch within Hamming ≤ ``hamming`` of
    ANY indexed document. Same three probe tiers and the same join
    orientation as ``dedup_ingest._history_dups`` (batch side is the
    build — history never broadcasts), but SimHash banding is only a
    candidate GENERATOR, so every (tbl, key) hit is verified with the
    exact in-row ``bit_count(new.sim XOR old.sim)`` against the
    STORED signature before it can drop a document — the decision
    rule is Hamming geometry, not bucket identity (that's what makes
    the stream's keep set match ``q_simhash_hamming_pairs``)."""
    from wd2duckdb_spark.streaming.dedup_ingest import (
        MAX_BROADCAST_KEYS,
        PROBE_CHUNK,
    )

    batch_side = keys.select(
        "tbl", "key", "doc_id", F.col("sim").alias("_new_sim")
    )
    verified = lambda j: (  # noqa: E731
        j.filter(
            F.bit_count(F.col("_new_sim").bitwiseXOR(F.col("sim")))
            <= hamming
        )
        .select("doc_id")
        .distinct()
    )
    if n_keys > MAX_BROADCAST_KEYS:
        return verified(
            seen.join(
                batch_side.hint("shuffle_hash"), ["tbl", "key"], "inner"
            )
        )
    if probe_keys:
        ks = sorted(set(probe_keys))
        chunks = [
            ks[i : i + PROBE_CHUNK] for i in range(0, len(ks), PROBE_CHUNK)
        ]
        pruned = seen.filter(F.col("key").isin(chunks[0]))
        for chunk in chunks[1:]:
            pruned = pruned.union(seen.filter(F.col("key").isin(chunk)))
        seen = pruned
    return verified(
        seen.join(F.broadcast(batch_side), ["tbl", "key"], "inner")
    )


def _batch_simhash_dedup(
    batch_df: DataFrame,
    batch_id: int,
    index_dir: str,
    out_dir: str,
    *,
    blocks: int,
    hamming: int,
) -> None:
    from wd2duckdb_spark.functions.dedup import simhash_signatures
    from wd2duckdb_spark.streaming.dedup_ingest import (
        INDEX_ROW_GROUP_BYTES,
        MAX_PROBE_CHUNKS,
        PROBE_CHUNK,
        _ensure_in_threshold,
        _has_committed_data,
    )

    spark = batch_df.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(index_dir).getFileSystem(hconf)
    index_exists = _has_committed_data(fs, jvm, index_dir)

    keys = dup_ids = None
    _ensure_in_threshold(spark)
    try:
        batch_df = batch_df.persist()
        sig = simhash_signatures(batch_df)
        # key-sorted within partitions: same row-group pruning layout
        # as the MinHash index (IN-pushdown probes skip row groups
        # whose key min/max misses the batch)
        keys = (
            _sig_banded_keys(sig, blocks=blocks, hamming=hamming)
            .sortWithinPartitions("key")
            .persist()
        )
        n_keys = keys.count()
        if index_exists and n_keys > 0:
            seen = (
                spark.read.parquet(index_dir)
                # a replayed batch must not self-collide with its own
                # crashed attempt's keys
                .filter(F.col("batch") != batch_id)
                .select("tbl", "key", "sim")
            )
            probe_keys = None
            if n_keys <= PROBE_CHUNK * MAX_PROBE_CHUNKS:
                probe_keys = [
                    r.key for r in keys.select("key").distinct().collect()
                ]
            hist_dups = _history_hamming_dups(
                keys,
                seen,
                hamming=hamming,
                n_keys=n_keys,
                probe_keys=probe_keys,
            )
        else:
            hist_dups = keys.limit(0).select("doc_id")
        # within-batch: exact pairs (a < b) via the shared pair
        # machinery — the larger id drops, the batch tier's keep-min
        batch_dups = simhash_pairs(
            sig, blocks=blocks, hamming=hamming
        ).select(F.col("b_id").alias("doc_id"))
        dup_ids = hist_dups.union(batch_dups).distinct().persist()

        kept = batch_df.join(dup_ids, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        # ALL docs' signatures index — kept AND dropped: a later doc
        # editing a DROPPED doc is still a near-copy of previously
        # seen content (same rationale as the MinHash tier)
        (
            keys.write.mode("overwrite")
            .option("parquet.block.size", str(INDEX_ROW_GROUP_BYTES))
            .parquet(f"{index_dir}/batch={batch_id}")
        )
        n_dups = dup_ids.count()
        n_in = batch_df.count()
        spark.createDataFrame(
            [(batch_id, n_in, n_dups, n_in - n_dups)],
            "batch_id long, n_in long, n_dups long, n_kept long",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{out_dir}/_metrics/batch={batch_id}"
        )
    finally:
        batch_df.unpersist()
        if keys is not None:
            keys.unpersist()
        if dup_ids is not None:
            dup_ids.unpersist()


def simhash_ingest_stream(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    available_now: bool = True,
    *,
    blocks: int = SIMHASH_BANDS,
    hamming: int = SIMHASH_HAMMING,
):
    """Dedup-at-ingest in the EDIT-DISTANCE mode (VERDICT r9 item 6):
    drop incoming documents within Hamming ≤ ``hamming`` of anything
    EVER ingested — the third ingest tier next to ``dedup_stream``
    (exact keys) and ``neardup_ingest_stream`` (MinHash set overlap):
    an edited near-copy changes few tokens, so its SimHash flips few
    bits while its shingle-set Jaccard can fall below any LSH
    threshold.

    Per micro-batch: 60-bit signatures via the shared batch
    machinery, then

    - HISTORY probe: the batch's Manku banded keys against the
      persisted (tbl, key, sim) index — candidates verified with the
      exact in-row Hamming test against the STORED signature (banding
      generates, geometry decides);
    - WITHIN-batch: exact pairs from :func:`simhash_pairs`; the
      larger doc_id drops (keep-min).

    Kept docs append under ``out_dir/batch=<id>``; ALL docs' keys +
    signatures index under ``index_dir/batch=<id>`` (dropped docs
    included — a later edit of a dropped doc is still previously-seen
    content). Both writes overwrite their own ``batch=<id>``
    partition, so a crash-replayed micro-batch rewrites instead of
    duplicating, and the probe's ``batch != batch_id`` filter keeps a
    replay from self-colliding — the exactly-once protocol of the
    MinHash tier, unchanged. Probe tiers (IN-pushdown row-group
    pruning / broadcast / shuffled-hash with the BATCH side as build)
    and the key-sorted small-row-group index layout are shared with
    ``dedup_ingest`` — history never broadcasts. The index speaks the
    same ``batch=<id>`` layout, so the SAME maintenance loop applies:
    ``dedup_ingest.archive_index`` folds old batches into the
    ``batch=-1`` archive and later probes still see the archived
    signatures (pinned in tests/test_round10_ops.py).

    Batch-twin parity (pinned in tests/test_round10_ops.py): with
    doc_ids arriving in order, the kept set equals the batch rule
    "drop every b_id of ``q_simhash_hamming_pairs``" regardless of
    where micro-batch boundaries fall. Docs with no tokens emit no
    signature and are always kept — same contract as the other
    tiers."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_simhash_dedup(
            batch_df,
            batch_id,
            index_dir,
            out_dir,
            blocks=blocks,
            hamming=hamming,
        )

    writer = docs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


#: No registered queries: the streaming store's correctness contract
#: is batch-twin parity (tests/test_streaming.py pins merged
#: signatures == simhash_signatures and stream pairs ==
#: q_simhash_hamming_pairs; tests/test_round10_ops.py pins the ingest
#: tier's kept set == the batch pair rule across boundary layouts,
#: dup-of-dropped-doc, and crash replay); simhash_candidates is
#: re-exported for probe composition.
QUERIES: dict = {}
ORACLES: dict[str, str] = {}

_ = simhash_candidates  # re-export for probe composition
