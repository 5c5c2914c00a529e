"""Table maintenance: small-file compaction and key-based upsert.

The reference writes its DuckDB file once and is done (single
transaction, commit-on-drop — main.rs:300-306); a 100 TB parquet lake
that is *continuously fed* (the streaming ingest path) instead
accumulates small files and receives corrections. These two operators
are the maintenance tier that keeps the §4.3 layout guarantees true
over time:

- :func:`compact` — N small files → ceil(bytes/target) right-sized
  ones, preserving (or establishing) the sort-column layout whose
  row-group min/max stats act as the reference's indices.
- :func:`upsert` — merge an updates set into a base table by key
  (the MERGE-by-key a correction feed needs; plain parquet has no
  transactional MERGE, so the engine expresses it as anti-join ∪
  updates — one shuffle-free broadcast anti join when the update set
  is small, which is the common case).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    on any FS Spark can reach (local, HDFS, s3a), not just local disk."""
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(hconf)
    return fs.getContentSummary(p).getLength()


def compact(
    spark: SparkSession,
    path: str,
    out_path: str,
    sort_cols: tuple[str, ...] | None = None,
    target_file_bytes: int = 128 << 20,
    mode: str = "overwrite",
) -> int:
    """Rewrite a many-small-files parquet dir into ``ceil(size/target)``
    right-sized files; returns the output file count.

    Without ``sort_cols`` this is a ``coalesce`` — NO shuffle: output
    partitions concatenate whole input files, so each input file's
    internally-sorted row groups keep their narrow min/max stats even
    though the concatenation isn't globally sorted. That makes
    shuffle-free compaction safe for the ingest layout (edge files are
    each sorted by src_id).

    With ``sort_cols`` it is a ``repartitionByRange + sortWithin`` —
    one shuffle that (re-)establishes the global range layout, the
    stronger guarantee worth paying for when files arrived unsorted
    (e.g. a streaming sink's micro-batch files).
    """
    df = spark.read.parquet(path)
    n = max(1, math.ceil(dir_bytes(spark, path) / target_file_bytes))
    if sort_cols:
        out = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        out = df.coalesce(n)
    out.write.mode(mode).parquet(out_path)
    return n


def upsert(base: DataFrame, updates: DataFrame, keys: list[str]) -> DataFrame:
    """Merge-by-key: rows of ``updates`` replace base rows with the same
    key; unmatched base rows survive; new keys append.

    Plan shape: ``base LEFT ANTI JOIN update-keys`` ∪ ``updates``. The
    anti join probes only the key columns of the update set — for the
    typical correction feed (updates ≪ base) Catalyst broadcasts it and
    the base table never shuffles; AQE falls back to a shuffled anti
    join when the update set is genuinely large. The union is
    by-name, so column order drift between feeds is harmless.
    """
    update_keys = updates.select(*keys).distinct()
    kept = base.join(update_keys, keys, "left_anti")
    return kept.unionByName(updates)


def merge_aggregate(
    base_agg: DataFrame,
    delta_rows: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a batch of
    NEW raw rows into an existing per-key aggregate without touching
    the raw history.

    ``base_agg`` holds per-key mergeable partials (a count column plus
    sum columns); ``delta_rows`` are raw incoming rows carrying the
    same key columns and, for each entry of ``sum_cols``, a raw value
    column under that partial's name (project/rename before calling). The delta is aggregated alone (small — one
    micro-batch / one day), then combined with the base by summing
    partials per key. Cost is O(|delta| + |affected keys|) — at 100 TB
    the alternative, re-aggregating the raw table, is the whole-world
    scan this operator exists to avoid. Works for any algebraic
    aggregate kept in partial form (count, sum; avg = sum/count at
    read time; min/max likewise mergeable); the sketch tier
    (operators/sketches.py) extends the same idea to distinct counts
    and quantiles.
    """
    from pyspark.sql import functions as F

    delta_agg = delta_rows.groupBy(*keys).agg(
        F.count("*").alias(count_col),
        *[F.sum(c).alias(c) for c in sum_cols],
    )
    both = base_agg.unionByName(delta_agg)
    return both.groupBy(*keys).agg(
        F.sum(count_col).alias(count_col),
        *[F.sum(c).alias(c) for c in sum_cols],
    )


def upsert_stream(
    events,
    base_path: str,
    keys: list[str],
    checkpoint: str,
    available_now: bool = True,
):
    """Streaming MERGE sink: each micro-batch upserts into the base
    parquet table via foreachBatch + :func:`upsert` — the
    exactly-once-per-batch correction feed (checkpoint tracks which
    source files were folded in).

    The rewrite cost is the base table once per batch — right for
    dimension-scale tables (the vertex/labels case); fact-scale
    streams should append + compact instead (see :func:`compact`).

    Crash safety of the swap (write staging → delete base → rename):
    a batch that dies mid-staging-write leaves the base untouched; a
    batch that dies between the delete and the rename leaves a
    complete staging dir and no base, which the next batch restores
    by renaming staging back into place BEFORE merging. Existence is
    checked explicitly with the FileSystem API — a transient read
    error propagates and fails the batch (Structured Streaming
    retries it) instead of being mistaken for "first batch", which
    would silently rebuild the base from one micro-batch. Replayed
    batches are harmless: :func:`upsert` is key-replace, idempotent.
    """

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        jvm = spark._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        Path = jvm.org.apache.hadoop.fs.Path
        base_p = Path(base_path)
        fs = base_p.getFileSystem(hconf)
        tmp = base_path.rstrip("/") + "._staging"
        tmp_p = Path(tmp)
        if not fs.exists(base_p) and fs.exists(tmp_p):
            # previous batch crashed between delete and rename: the
            # staging dir is the fully-written merged base — restore.
            fs.rename(tmp_p, base_p)
        if fs.exists(base_p):
            base = spark.read.parquet(base_path)  # read errors propagate
            merged = upsert(base, batch_df, keys)
        else:
            merged = batch_df  # genuinely the first batch
        # rewrite to a temp dir then swap: a failed write must not
        # destroy the current base (parquet has no transaction log)
        merged.write.mode("overwrite").parquet(tmp)
        fs.delete(base_p, True)
        fs.rename(tmp_p, base_p)

    writer = events.writeStream.foreachBatch(_merge).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
