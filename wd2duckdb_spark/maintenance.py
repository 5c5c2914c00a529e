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
