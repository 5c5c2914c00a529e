"""CLI — same surface as the reference binary (main.rs:21-31, 246-331):

    python -m wd2duckdb_spark --json dump.json --database out.duckdb

Pipeline: dump → distributed 6-table ingest (parquet) → DuckDB export
with the reference's DDL + indices. A user of ``wd2duckdb --json X
--database Y`` runs this with the same two flags and gets the same
database file, built by a Spark cluster instead of a single-threaded
loop.

Differences from the reference, by design:

- ``--json -`` (stdin, main.rs:261-269) works: stdin is staged to a
  driver-local temp file (with bz2/gz magic sniffing, so ``bzcat dump
  | --json -`` and ``cat dump.bz2 | --json -`` both behave), then
  ingested distributed. Staging is inherently single-stream — at
  scale, point ``--json`` at the dump file instead (Spark reads
  .bz2/.gz natively and splits the read), or use ``--stream-dir``
  (Structured Streaming) for continuous arrival.
- ``--parquet-out`` keeps the distributed parquet tables (the
  engine-native form) next to the DuckDB file.
- ``--lang`` makes the English-only projection configurable
  (README.md:6-8 invites exactly this).
"""

from __future__ import annotations

import argparse
import shutil
import sys
import tempfile
import time


def _stage_stdin() -> str:
    """Stage the ``--json -`` stdin stream to a temp file Spark can
    read (the reference reads the dump from ``-``; Spark sources need
    a seekable path). Sniffs bz2/gz magic bytes so piping either the
    decompressed dump (``bzcat dump | … -``) or the compressed file
    itself (``cat dump.bz2 | … -``) picks the right codec."""
    import os

    head = sys.stdin.buffer.read(4)
    suffix = ".json"
    if head.startswith(b"BZh"):
        suffix = ".json.bz2"
    elif head.startswith(b"\x1f\x8b"):
        suffix = ".json.gz"
    fd, path = tempfile.mkstemp(prefix="wd2duckdb_stdin_", suffix=suffix)
    with os.fdopen(fd, "wb") as f:
        f.write(head)
        shutil.copyfileobj(sys.stdin.buffer, f, 1 << 20)
    return path


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="wd2duckdb_spark",
        description="Wikidata JSON dump -> queryable DuckDB, on Spark",
    )
    p.add_argument(
        "--json",
        default=None,
        help="dump path (.json/.bz2/.gz), or '-' to read the dump from "
        "stdin; required unless --stream-dir",
    )
    p.add_argument("--database", required=True, help="output DuckDB file")
    p.add_argument("--lang", default="en", help="label/description language")
    p.add_argument(
        "--parquet-out",
        default=None,
        help="keep the parquet tables at this path (default: temp dir)",
    )
    p.add_argument(
        "--overwrite", action="store_true", help="replace an existing target"
    )
    p.add_argument(
        "--edge-layout",
        choices=("sort", "zorder", "none"),
        default="sort",
        help="edge-table file layout: lexical (src,dst) sort, Morton "
        "z-order (both-endpoint pruning), or unsorted",
    )
    p.add_argument(
        "--stream-dir",
        default=None,
        help="directory of arriving dump shards (streaming mode; "
        "replaces --json)",
    )
    args = p.parse_args(argv)
    if (args.json is None) == (args.stream_dir is None):
        p.error("exactly one of --json or --stream-dir is required")

    staged_stdin = None
    if args.json == "-":
        staged_stdin = args.json = _stage_stdin()

    from wd2duckdb_spark import get_spark
    from wd2duckdb_spark.sources.duckdb_io import export_duckdb

    import os

    if os.path.exists(args.database) and not args.overwrite:
        # the reference's existing-target guard (main.rs:249-255)
        print(f"error: {args.database} already exists", file=sys.stderr)
        return 1

    out = args.parquet_out or tempfile.mkdtemp(prefix="wd2duckdb_spark_")
    if (
        args.stream_dir
        and not args.overwrite
        and os.path.exists(f"{out}/vertex")
    ):
        # the streaming sink appends — guard against silent duplication
        # (the batch path refuses via mode='error' already)
        print(
            f"error: {out} already holds tables; pass --overwrite to "
            "resume/append intentionally",
            file=sys.stderr,
        )
        return 1

    spark = get_spark(app_name="wd2duckdb_spark_cli")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()
    try:
        if args.stream_dir:
            from wd2duckdb_spark.streaming import ingest_stream

            q = ingest_stream(
                spark,
                args.stream_dir,
                out,
                f"{out}/_checkpoint",
                lang=args.lang,
                available_now=True,
            )
            q.awaitTermination()
        else:
            from wd2duckdb_spark.ingest import ingest

            counters: dict = {}
            ingest(
                spark,
                args.json,
                out,
                lang=args.lang,
                mode="overwrite" if args.overwrite else "error",
                edge_layout=args.edge_layout,
                metrics=counters,
            )
        if args.stream_dir:
            n = spark.read.parquet(f"{out}/vertex").count()
        else:
            # observed inside the write jobs — no extra counting pass
            n = counters["entities"]
            if counters["corrupt_lines"]:
                # the reference warns per malformed line (main.rs:316-321)
                print(
                    f"warning: {counters['corrupt_lines']} malformed "
                    "lines skipped",
                    file=sys.stderr,
                )
        export_duckdb(out, args.database, overwrite=args.overwrite)
        # the reference's progress line shape (main.rs:229-236)
        print(
            f"{n} entities processed in {time.perf_counter() - t0:.1f} seconds"
        )
        return 0
    finally:
        if args.parquet_out is None:
            shutil.rmtree(out, ignore_errors=True)
        if staged_stdin is not None:
            import os

            os.unlink(staged_stdin)
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
