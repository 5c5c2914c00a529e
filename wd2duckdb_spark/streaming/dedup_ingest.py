"""Near-duplicate dedup AT INGEST: a streaming stage that drops
incoming documents near-duplicating anything EVER ingested, using a
persisted MinHash-LSH band-key index.

This is the production shape of training-data dedup (the reference's
pipeline has no streaming tier; this extends the batch
``functions.dedup`` semantics to a feed): ``dedup_stream`` (exact
keys, watermark-bounded state) repairs at-least-once delivery;
THIS stage enforces corpus-level content uniqueness — its state is
the whole history, so it lives in a parquet index on the lake, not in
the state store:

- per micro-batch, compute each doc's LSH band keys
  (:func:`wd2duckdb_spark.functions.dedup.band_keys` — the same
  signature pipeline as the batch pair generator, so batch and stream
  cannot drift);
- a doc is a DUP if any of its band keys exists in the index (seen in
  any earlier batch) or is shared with a smaller doc_id in the same
  batch (bucket-min keep rule — the batch tier's canonical-min
  convention);
- kept docs append to ``out_dir``; ALL docs' band keys (kept AND
  dropped) append to ``index_dir``. Indexing dropped docs too keeps
  the cross-batch rule aligned with the batch twin
  (``q_lsh_keep_list``, whose window-min ranges over every doc): a
  later doc near-duplicating only a DROPPED doc is still a duplicate
  of previously-seen content and must be dropped — keep decisions
  then do not depend on where micro-batch boundaries fell. Both
  writes go to ``batch=<id>`` subdirectories with overwrite, so a
  REPLAYED micro-batch (restart after crash) rewrites its own output
  instead of duplicating it — idempotent, exactly-once end to end.

The index's absence is checked EXPLICITLY with the FileSystem API
(same discipline as ``maintenance.upsert_stream``), and "absent"
means NO COMMITTED DATA FILE anywhere under ``index_dir`` — a crash
during the very first index write can leave ``batch=0/_temporary``
droppings, and a name-only check would then read an empty dataset
("unable to infer schema") and wedge the stream on every retry. A
transient read error still fails the batch (Structured Streaming
retries it), not mistaken for "first batch" — which would silently
admit every near-duplicate of the prior corpus.

Scale: the only join against history is the index probe, oriented so
the MICRO-BATCH side is the broadcast build
(:func:`_history_dups`): ``seen ⋈ broadcast(bands)`` — the index
side only ever streams through the join (scan + in-memory hash
probe, no exchange of history). A left-semi with the batch on the
left would invert that: Spark supports LeftSemi builds only on the
right, so past the broadcast threshold the ENTIRE band-key history
would shuffle every micro-batch. Index growth is ~N_BANDS rows per
ingested doc; rewrites (``maintenance.compact_partitioned`` /
:func:`compact_index`) must PRESERVE the ``batch=<id>`` partition
layout — it carries the replay filter.

Docs with fewer than 3 tokens emit no shingles, hence no band keys,
and are always kept — same contract as the batch tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from wd2duckdb_spark.functions.dedup import band_keys


def _has_committed_data(fs, jvm, index_dir: str) -> bool:
    """True iff a non-hidden DATA FILE exists under ``index_dir`` —
    directly or inside a first-level ``batch=<id>`` subdirectory.
    Directory names alone don't count: a crashed first write leaves
    ``batch=0/_temporary`` and nothing else, which must read as
    "no index yet", not as a committed index (ADVICE r3)."""
    idx_path = jvm.org.apache.hadoop.fs.Path(index_dir)
    if not fs.exists(idx_path):
        return False
    for st in fs.listStatus(idx_path):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if st.isFile():
            return True
        for sub in fs.listStatus(st.getPath()):
            if sub.isFile() and not sub.getPath().getName().startswith(
                ("_", ".")
            ):
                return True
    return False


def _history_dups(bands: DataFrame, seen: DataFrame) -> DataFrame:
    """doc_ids (of the current batch) whose band keys hit the
    persisted index.

    Join orientation is the scale contract (VERDICT r3 item 1): the
    BATCH side is the explicit broadcast build — bounded at one
    micro-batch of band keys — and the history index is the streamed
    probe side, so nothing history-sized ever shuffles or broadcasts,
    however large the corpus grows. (The natural-looking
    ``bands.join(seen, "left_semi")`` is wrong at scale: LeftSemi
    can only build RIGHT, i.e. broadcast the index.)"""
    return (
        seen.join(
            F.broadcast(bands.select("band", "key", "doc_id")),
            ["band", "key"],
            "inner",
        )
        .select("doc_id")
        .distinct()
    )


def _batch_dedup(
    batch_df: DataFrame, batch_id: int, index_dir: str, out_dir: str
) -> None:
    spark = batch_df.sparkSession
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.Path(index_dir).getFileSystem(hconf)
    index_exists = _has_committed_data(fs, jvm, index_dir)

    bands = band_keys(batch_df).persist()
    dup_ids = None
    try:
        if index_exists:  # read errors PROPAGATE (batch retried)
            seen = (
                spark.read.parquet(index_dir)
                # a REPLAYED batch must not see its own keys from the
                # crashed attempt — it would drop its docs as self-dups
                .filter(F.col("batch") != batch_id)
                .select("band", "key")
            )
            hist_dups = _history_dups(bands, seen)
        else:  # genuinely the first batch
            hist_dups = bands.limit(0).select("doc_id")
        w = Window.partitionBy("band", "key")
        batch_dups = (
            bands.withColumn("_mn", F.min("doc_id").over(w))
            .filter(F.col("doc_id") > F.col("_mn"))
            .select("doc_id")
        )
        dup_ids = hist_dups.union(batch_dups).distinct().persist()

        kept = batch_df.join(dup_ids, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")
        # ALL band keys are indexed, dropped docs included — see module
        # docstring (cross-batch parity with the batch twin's
        # every-doc window-min)
        bands.write.mode("overwrite").parquet(f"{index_dir}/batch={batch_id}")
    finally:  # a failed write must not leak cached RDDs across retries
        bands.unpersist()
        if dup_ids is not None:
            dup_ids.unpersist()


def compact_index(spark, index_dir: str, target_file_bytes: int = 128 << 20):
    """Compact the band-key index in place, preserving the
    ``batch=<id>`` partition layout the replay filter depends on.
    Thin wrapper over :func:`maintenance.compact_partitioned`; run it
    only while the stream is stopped (the swap is not coordinated
    with a concurrent ``foreachBatch``)."""
    from wd2duckdb_spark.maintenance import compact_partitioned

    return compact_partitioned(
        spark, index_dir, "batch", target_file_bytes=target_file_bytes
    )


def neardup_ingest_stream(
    docs: DataFrame,
    index_dir: str,
    out_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start the dedup-at-ingest stage over a streaming ``documents``
    source; returns the StreamingQuery. Read the kept corpus with
    ``spark.read.parquet(out_dir)`` (the ``batch`` partition column
    records provenance)."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        _batch_dedup(batch_df, batch_id, index_dir, out_dir)

    writer = docs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
