"""Custom Python DataSource (`wikidata_dump` format): registration,
fixture parity, EqualTo-on-id pushdown, and the byte-range split
protocol (no duplicated or lost lines across partition boundaries)."""

from __future__ import annotations

import json

import pytest

from tests.conftest import FIXTURE_DUMP


@pytest.fixture()
def registered(spark):
    from wd2duckdb_spark.sources.pydatasource import WikidataDumpDataSource

    spark.dataSource.register(WikidataDumpDataSource)
    return spark


def test_fixture_parity(registered, spark):
    """Reading the mini dump through the custom source yields exactly
    the sanitized entity lines (7 entities, frame lines dropped)."""
    df = spark.read.format("wikidata_dump").load(FIXTURE_DUMP)
    rows = df.collect()
    want_ids, n_lines = [], 0
    with open(FIXTURE_DUMP) as fh:
        for line in fh:
            s = line.strip().rstrip(",")
            if s and s not in ("[", "]"):
                n_lines += 1
                try:
                    want_ids.append(json.loads(s)["id"])
                except json.JSONDecodeError:
                    pass  # the fixture's deliberate corrupt line
    # corrupt lines pass through (id extracted by regex or None) —
    # quarantine is the ingest tier's job, not the source's
    assert len(rows) == n_lines
    assert set(want_ids) <= {r.id for r in rows if r.id is not None}
    assert all(r.entity_type in ("item", "property", "lexeme", None) for r in rows)
    for r in rows:
        try:
            assert json.loads(r.line)["id"] == r.id
        except json.JSONDecodeError:
            pass


def test_id_filter_pushdown(registered, spark):
    """`id = X` reaches the source: result is exactly that entity, and
    the plan's post-scan filter no longer needs to do the work (we
    assert semantics — the probe path — not the plan string, since
    Python-source plans render opaquely)."""
    df = spark.read.format("wikidata_dump").load(FIXTURE_DUMP)
    some_id = (
        df.filter(df.id.isNotNull()).select("id").orderBy("id").first()["id"]
    )
    got = df.filter(df.id == some_id).collect()
    assert len(got) == 1 and got[0].id == some_id


def test_split_protocol_no_dup_no_loss(registered, spark, tmp_path):
    """A file split into many tiny byte ranges reproduces every line
    exactly once — the align-to-next-newline ownership rule."""
    p = tmp_path / "big.json"
    n = 500
    with open(p, "w") as fh:
        for i in range(n):
            fh.write(
                json.dumps(
                    {"id": f"Q{i}", "type": "item", "pad": "x" * (i % 37)}
                )
                + "\n"
            )
    df = (
        spark.read.format("wikidata_dump")
        .option("split_bytes", 256)  # ~hundreds of splits
        .load(str(p))
    )
    ids = [r.id for r in df.collect()]
    assert len(ids) == n
    assert sorted(ids, key=lambda s: int(s[1:])) == [f"Q{i}" for i in range(n)]
    # planning really did fan out
    from wd2duckdb_spark.sources.pydatasource import WikidataDumpReader

    r = WikidataDumpReader({"path": str(p), "split_bytes": 256})
    assert len(r.partitions()) > 10


def test_pushdown_contract_unit():
    """pushFilters consumes exactly one id-equality and returns the
    rest for Spark to evaluate."""
    from pyspark.sql.datasource import EqualTo

    from wd2duckdb_spark.sources.pydatasource import WikidataDumpReader

    r = WikidataDumpReader({"path": "/dev/null"})
    eq_id = EqualTo(("id",), "Q42")
    eq_other = EqualTo(("entity_type",), "item")
    rest = list(r.pushFilters([eq_id, eq_other]))
    assert r.id_filter == "Q42"
    assert rest == [eq_other]


def test_stream_reader_exactly_once_across_restarts(
    registered, spark, tmp_path
):
    """Streaming variant: shards are consumed exactly once, offsets
    survive a checkpoint restart, and new shards picked up after
    restart produce only their own rows."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def write_shard(name, ids):
        lines = [f'{{"id":"{i}","type":"item","claims":{{}}}},' for i in ids]
        (shard_dir / name).write_text("[\n" + "\n".join(lines) + "\n]\n")

    write_shard("s0.json", ["Q1", "Q2"])
    write_shard("s1.json", ["Q3"])

    out = str(tmp_path / "out")

    def run_once():
        q = (
            spark.readStream.format("wikidata_dump")
            .load(str(shard_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return [r.id for r in spark.read.parquet(out).collect()]

    assert sorted(run_once()) == ["Q1", "Q2", "Q3"]

    # restart with one new shard: the checkpointed offset skips the
    # already-ingested shards, so only the new rows append — and
    # nothing duplicates (exactly-once into the file sink)
    write_shard("s2.json", ["Q4", "Q5"])
    got = run_once()
    assert sorted(got) == ["Q1", "Q2", "Q3", "Q4", "Q5"]


def test_stream_reader_revisits_growing_shard(registered, spark, tmp_path):
    """ADVICE r2: a shard listed while still being written must be
    ingested up to its last COMPLETE line and revisited for the
    appended tail — name-only offsets dropped the tail silently. The
    partial trailing line (no newline yet) must never be emitted as a
    half-record."""
    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    shard = shard_dir / "grow.json"

    def line(i):
        return f'{{"id":"{i}","type":"item","claims":{{}}}},'

    # complete lines for Q1/Q2, then a HALF-WRITTEN Q3 line (no \n)
    shard.write_text(
        "[\n" + line("Q1") + "\n" + line("Q2") + "\n" + line("Q3")[:10]
    )

    def run_once():
        q = (
            spark.readStream.format("wikidata_dump")
            .load(str(shard_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    assert run_once() == ["Q1", "Q2"]  # half-line withheld, not mangled

    # the writer finishes Q3 and appends Q4
    with open(shard, "a") as fh:
        fh.write(line("Q3")[10:] + "\n" + line("Q4") + "\n")
    assert run_once() == ["Q1", "Q2", "Q3", "Q4"]  # delta only, no dup


def test_stream_compressed_shard_grace_and_restart(registered, spark, tmp_path):
    """Compressed shards are ingested whole only once their mtime is
    older than compressed_grace_sec (a fresh mtime = possibly still
    being written), and — because mtime persists, unlike an in-memory
    stability probe — a driver restart neither re-ingests the shard
    (duplicate rows) nor trips the shrank-shard guard."""
    import gzip
    import os
    import time

    shard_dir = tmp_path / "shards"
    shard_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def line(i):
        return f'{{"id":"{i}","type":"item","claims":{{}}}},\n'

    (shard_dir / "base.json").write_text("[\n" + line("Q9") + "]\n")
    gz = shard_dir / "s0.json.gz"
    with gzip.open(gz, "wt") as fh:
        fh.write("[\n" + line("Q1") + line("Q2") + "]\n")

    def run_once():
        q = (
            spark.readStream.format("wikidata_dump")
            .option("compressed_grace_sec", "60")
            .load(str(shard_dir))
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return sorted(r.id for r in spark.read.parquet(out).collect())

    # fresh mtime: the gz shard is withheld, only the json ingests
    assert run_once() == ["Q9"]

    # age the shard past the grace window: ingested whole, once
    old = time.time() - 300
    os.utime(gz, (old, old))
    assert run_once() == ["Q1", "Q2", "Q9"]

    # "restart": a new query instance against the same checkpoint —
    # the persisted mtime keeps the shard reported at its full size,
    # so nothing re-emits and nothing raises
    assert run_once() == ["Q1", "Q2", "Q9"]
