"""Table-maintenance tier: compaction and upsert semantics + plans."""

from __future__ import annotations

import pytest

import pathlib

import pyspark.sql.functions as F

from tests.conftest import SF_DIR
from wd2duckdb_spark.catalog import tbl
from wd2duckdb_spark.maintenance import compact, dir_bytes, upsert
from wd2duckdb_spark.plans import plan_summary


def _parquet_files(path):
    return sorted(pathlib.Path(path).glob("*.parquet"))


def test_compact_coalesce_rightsizes(spark, tmp_path):
    """32 tiny files → the computed ceil(bytes/target) file count, same
    rows, via the shuffle-free coalesce path."""
    src = str(tmp_path / "many")
    tbl(spark, SF_DIR, "events").repartition(32).write.parquet(src)
    assert len(_parquet_files(src)) == 32

    out = str(tmp_path / "compacted")
    target = max(1, dir_bytes(spark, src) // 4)  # aim for ~4-5 files
    n = compact(spark, src, out, target_file_bytes=target)
    got = _parquet_files(out)
    assert len(got) == n <= 6
    assert (
        spark.read.parquet(out).count() == spark.read.parquet(src).count()
    )


def test_compact_sorted_establishes_ranges(spark, tmp_path):
    """sort_cols compaction yields range-disjoint files: per-file
    [min,max] of the sort key never overlap — the layout whose footer
    stats prune point/range reads."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "unsorted")
    tbl(spark, SF_DIR, "events").repartition(16).write.parquet(src)
    out = str(tmp_path / "sorted")
    target = max(1, dir_bytes(spark, src) // 3)
    compact(spark, src, out, sort_cols=("user_id",), target_file_bytes=target)

    spans = []
    for f in _parquet_files(out):
        md = pq.ParquetFile(f).metadata
        idx = pq.ParquetFile(f).schema_arrow.get_field_index("user_id")
        mins = [md.row_group(i).column(idx).statistics.min
                for i in range(md.num_row_groups)]
        maxs = [md.row_group(i).column(idx).statistics.max
                for i in range(md.num_row_groups)]
        spans.append((min(mins), max(maxs)))
    spans.sort()
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo, f"file ranges overlap: {spans}"
    assert (
        spark.read.parquet(out).count() == spark.read.parquet(src).count()
    )


def test_upsert_semantics(spark):
    """Updates replace matching keys, base rows survive, new keys
    append — checked row-for-row."""
    base = spark.createDataFrame(
        [(k, f"old_{k}") for k in range(1, 6)], "k long, v string"
    )
    updates = spark.createDataFrame(
        [(k, f"new_{k}") for k in range(4, 8)], "k long, v string"
    )
    got = sorted(map(tuple, upsert(base, updates, ["k"]).collect()))
    want = sorted(
        [(k, f"old_{k}") for k in range(1, 4)]
        + [(k, f"new_{k}") for k in range(4, 8)]
    )
    assert got == want


def test_upsert_plan_broadcasts_keys(spark):
    """The correction-feed plan: the anti join builds on the (small)
    update-key side — base never shuffles; no nested loop."""
    from wd2duckdb_spark.operators.analytics import q_upsert_merge
    from wd2duckdb_spark.plans import explain_str

    df = q_upsert_merge(spark, SF_DIR)
    s = plan_summary(df)
    assert s["nested_loop_join"] == 0
    assert "LeftAnti" in explain_str(df, "simple")
    assert s["broadcast_hash_join"] >= 1


def test_merge_aggregate_equals_full_recompute(spark):
    """Folding the post-cut delta into the pre-cut aggregate ==
    aggregating everything — per key, count and sum."""
    from wd2duckdb_spark.maintenance import merge_aggregate

    e = tbl(spark, SF_DIR, "events")
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    base = (
        e.filter(F.col("ts") <= cut)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    )
    delta = e.filter(F.col("ts") > cut).select(
        "user_id", F.col("value").alias("v")
    )
    got = {
        r.user_id: (r.n, round(r.v, 2))
        for r in merge_aggregate(base, delta, ["user_id"], "n", ("v",)).collect()
    }
    want = {
        r.user_id: (r.n, round(r.v, 2))
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    assert got == want


def test_upsert_stream_merges_batches(spark, tmp_path):
    """Two micro-batches with overlapping keys upsert into the base
    parquet table; final table = batch0 keys overwritten by batch1."""
    from wd2duckdb_spark.maintenance import upsert_stream

    schema = "k long, v string"
    in_dir = tmp_path / "upsert_in"
    in_dir.mkdir()
    spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], schema
    ).coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    spark.createDataFrame(
        [(2, "b1"), (4, "d1")], schema
    ).coalesce(1).write.parquet(str(in_dir / "b1.parquet"))

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*.parquet")
    )
    base = str(tmp_path / "upsert_base")
    q = upsert_stream(stream, base, ["k"], str(tmp_path / "upsert_ckpt"))
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(base).collect()))
    assert got == [(1, "a0"), (2, "b1"), (3, "c0"), (4, "d1")]


def test_upsert_stream_recovers_interrupted_swap(spark, tmp_path):
    """Crash between the swap's delete and rename leaves a complete
    ._staging dir and no base. The next batch must restore staging as
    the base and merge into it — NOT rebuild the base from the single
    micro-batch (ADVICE r1: the old bare-except treated any missing
    base as 'first batch', discarding merged history)."""
    import shutil

    from wd2duckdb_spark.maintenance import upsert_stream

    schema = "k long, v string"
    base = str(tmp_path / "swap_base")
    # simulate the crash point: merged history is in ._staging, base gone
    spark.createDataFrame(
        [(1, "a0"), (2, "b0"), (3, "c0")], schema
    ).coalesce(1).write.parquet(base + "._staging")
    assert not __import__("os").path.exists(base)

    in_dir = tmp_path / "swap_in"
    in_dir.mkdir()
    spark.createDataFrame([(2, "b1"), (4, "d1")], schema).coalesce(
        1
    ).write.parquet(str(in_dir / "b0.parquet"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir) + "/*.parquet")
    )
    q = upsert_stream(stream, base, ["k"], str(tmp_path / "swap_ckpt"))
    q.awaitTermination(120)

    got = sorted(map(tuple, spark.read.parquet(base).collect()))
    # history (1, 3) survived, key 2 replaced, key 4 appended
    assert got == [(1, "a0"), (2, "b1"), (3, "c0"), (4, "d1")]
    shutil.rmtree(base + "._staging", ignore_errors=True)


def test_snapshot_time_travel(spark, tmp_path):
    from pyspark.sql import functions as F

    from wd2duckdb_spark.maintenance import (
        snapshot_history,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    v0 = snapshot_write(spark, spark.range(10), t, mode="overwrite")
    v1 = snapshot_write(spark, spark.range(10, 15), t, mode="append")
    v2 = snapshot_write(spark, spark.range(100, 103), t, mode="overwrite")
    assert (v0, v1, v2) == (0, 1, 2)

    assert snapshot_read(spark, t, 0).count() == 10
    assert snapshot_read(spark, t, 1).count() == 15
    assert snapshot_read(spark, t, 2).count() == 3
    assert snapshot_read(spark, t).count() == 3  # latest
    assert {r.id for r in snapshot_read(spark, t, 1).collect()} == set(
        range(15)
    )

    hist = snapshot_history(spark, t)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert [h["op"] for h in hist] == ["overwrite", "append", "overwrite"]
    assert [h["n_dirs"] for h in hist] == [1, 2, 1]


def test_snapshot_diff_append_fast_path_no_join(spark, tmp_path):
    """Append-only lineage: the CDC feed must come straight from the
    added directories — scan-only plan, no join anywhere."""
    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    t = str(tmp_path / "tbl")
    snapshot_write(spark, spark.range(10), t, mode="overwrite")
    snapshot_write(spark, spark.range(10, 14), t, mode="append")

    d = snapshot_diff(spark, t, 0, 1)
    rows = d.collect()
    assert {r.id for r in rows} == set(range(10, 14))
    assert {r._change for r in rows} == {"insert"}
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan

    # same-version diff: empty, same schema
    assert snapshot_diff(spark, t, 1, 1).count() == 0


def test_snapshot_diff_keyed_after_rewrite(spark, tmp_path):
    from pyspark.sql import functions as F

    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    t = str(tmp_path / "tbl")
    base = spark.range(10).select("id", (F.col("id") * 2).alias("val"))
    snapshot_write(spark, base, t, mode="overwrite")
    # v1 rewrites: drop ids 8-9, update val of id 0, insert id 100
    nxt = (
        spark.range(8)
        .select(
            "id",
            F.when(F.col("id") == 0, 999).otherwise(F.col("id") * 2).alias(
                "val"
            ),
        )
        .unionByName(
            spark.createDataFrame([(100, 7)], "id long, val long")
        )
    )
    snapshot_write(spark, nxt, t, mode="overwrite")

    import pytest

    with pytest.raises(ValueError):
        snapshot_diff(spark, t, 0, 1)  # rewritten lineage needs keys

    got = {
        (r.id, r._change)
        for r in snapshot_diff(spark, t, 0, 1, keys=["id"]).collect()
    }
    assert got == {
        (8, "delete"),
        (9, "delete"),
        (0, "update"),
        (100, "insert"),
    }


def test_snapshot_restore_is_zero_copy_rollback(spark, tmp_path):
    from wd2duckdb_spark.maintenance import (
        _read_manifest,
        snapshot_history,
        snapshot_read,
        snapshot_restore,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(spark, spark.range(10), t, mode="overwrite")
    snapshot_write(spark, spark.range(3), t, mode="overwrite")
    v = snapshot_restore(spark, t, 0)
    assert v == 2
    assert snapshot_read(spark, t).count() == 10  # latest == v0 content
    assert snapshot_read(spark, t, 1).count() == 3  # history intact
    m = _read_manifest(spark, t, 2)
    assert m["dirs"] == _read_manifest(spark, t, 0)["dirs"]  # no copy
    assert m["restored_from"] == 0
    assert snapshot_history(spark, t)[-1]["op"] == "restore"


def test_snapshot_commit_race_retries(spark, tmp_path):
    """If another writer claims version N first, the losing writer
    must commit at N+1 and leave no orphan manifest."""
    from wd2duckdb_spark.maintenance import (
        _manifest_versions,
        snapshot_read,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(spark, spark.range(5), t, mode="overwrite")
    # simulate a racing writer that already committed version 1
    log = tmp_path / "tbl" / "_log"
    (log / "00000001.json").write_text(
        '{"version": 1, "op": "overwrite", "dirs": ["data/v00000001"]}'
    )
    (tmp_path / "tbl" / "data" / "v00000001").mkdir(parents=True)
    spark.range(7).write.mode("overwrite").parquet(
        str(tmp_path / "tbl" / "data" / "v00000001")
    )

    v = snapshot_write(spark, spark.range(20), t, mode="overwrite")
    assert v == 2
    assert _manifest_versions(spark, t) == [0, 1, 2]
    assert snapshot_read(spark, t).count() == 20
    assert snapshot_read(spark, t, 1).count() == 7


def test_snapshot_vacuum_reclaims_orphans_and_old_versions(spark, tmp_path):
    from wd2duckdb_spark.maintenance import (
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )

    t = str(tmp_path / "tbl")
    snapshot_write(spark, spark.range(4), t, mode="overwrite")
    snapshot_write(spark, spark.range(6), t, mode="overwrite")
    # orphan: a data dir no manifest references (crashed writer)
    orphan = tmp_path / "tbl" / "data" / "v99999999"
    spark.range(2).write.parquet(str(orphan))

    deleted = snapshot_vacuum(spark, t, keep_last=1)
    assert "data/v99999999" in deleted
    assert "data/v00000000" in deleted  # only v0 referenced it
    assert snapshot_read(spark, t).count() == 6  # latest untouched


def test_snapshot_schema_evolution(spark, tmp_path):
    from pyspark.sql import functions as F

    from wd2duckdb_spark.maintenance import snapshot_read, snapshot_write

    t = str(tmp_path / "tbl")
    snapshot_write(spark, spark.range(3), t, mode="overwrite")
    snapshot_write(
        spark,
        spark.range(3, 5).withColumn("tag", F.lit("new")),
        t,
        mode="append",
    )
    evolved = snapshot_read(spark, t, merge_schema=True)
    assert set(evolved.columns) == {"id", "tag"}
    rows = {r.id: r.tag for r in evolved.collect()}
    assert rows[0] is None and rows[4] == "new"


def test_snapshot_stream_commits_per_batch(spark, tmp_path):
    from wd2duckdb_spark.maintenance import (
        snapshot_history,
        snapshot_read,
        snapshot_stream,
    )

    src = tmp_path / "src"
    src.mkdir()
    spark.range(10).coalesce(1).write.parquet(str(src / "b0"))
    schema = spark.read.parquet(str(src / "b0")).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*")
    t = str(tmp_path / "tbl")
    q = snapshot_stream(
        stream, t, checkpoint=str(tmp_path / "ckpt"), mode="append"
    )
    q.awaitTermination(120)

    # second batch arrives; restart the availableNow stream
    spark.range(10, 15).coalesce(1).write.parquet(str(src / "b1"))
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src) + "/*")
    q = snapshot_stream(
        stream, t, checkpoint=str(tmp_path / "ckpt"), mode="append"
    )
    q.awaitTermination(120)

    assert snapshot_read(spark, t).count() == 15
    hist = snapshot_history(spark, t)
    assert len(hist) >= 2 and all(h["op"] == "append" for h in hist)
    # time travel to the first commit sees only batch 0
    assert snapshot_read(spark, t, 0).count() == 10


@pytest.mark.slow
def test_snapshot_model_based_random_ops(spark, tmp_path):
    """Model-based check: a random interleaving of overwrite/append
    commits, time-travel reads, and vacuums must always agree with a
    trivial in-memory model of the log."""
    import random

    from wd2duckdb_spark.maintenance import (
        snapshot_history,
        snapshot_read,
        snapshot_vacuum,
        snapshot_write,
    )

    rng = random.Random(42)
    t = str(tmp_path / "tbl")
    model: dict[int, set[int]] = {}  # version -> expected id set
    vacuumed_before = -1  # versions <= this may have lost data dirs
    next_range = 0

    for step in range(12):
        op = rng.choice(["overwrite", "append", "append", "vacuum"])
        if op == "vacuum" and model:
            keep = rng.randint(1, 2)
            snapshot_vacuum(spark, t, keep_last=keep)
            vacuumed_before = max(model) - keep
            continue
        ids = set(range(next_range, next_range + rng.randint(1, 5)))
        next_range += 5
        df = spark.createDataFrame(
            [(i,) for i in sorted(ids)], "id long"
        )
        v = snapshot_write(
            spark, df, t, mode=op if model else "overwrite"
        )
        prev = model[max(model)] if (model and op == "append") else set()
        model[v] = prev | ids

        # latest always readable and exact
        got = {r.id for r in snapshot_read(spark, t).collect()}
        assert got == model[v], f"step {step}: {got} != {model[v]}"
        # a random non-vacuumed historical version must time-travel
        candidates = [
            w for w in model if w > vacuumed_before and w != v
        ]
        if candidates:
            w = rng.choice(candidates)
            got_w = {r.id for r in snapshot_read(spark, t, w).collect()}
            assert got_w == model[w], f"v{w}: {got_w} != {model[w]}"

    hist = snapshot_history(spark, t)
    assert [h["version"] for h in hist] == sorted(model)


def test_snapshot_diff_keys_cover_all_columns(spark, tmp_path):
    """ADVICE r2: when `keys` covers every column there are no non-key
    columns to hash — md5(to_json(struct())) failed outright. The diff
    degrades to presence-only: insert/delete, never update."""
    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    t = str(tmp_path / "tbl")
    snapshot_write(
        spark,
        spark.createDataFrame([(1,), (2,), (3,)], "id long"),
        t,
        mode="overwrite",
    )
    snapshot_write(
        spark,
        spark.createDataFrame([(2,), (3,), (4,)], "id long"),
        t,
        mode="overwrite",
    )
    got = {
        (r.id, r._change)
        for r in snapshot_diff(spark, t, 0, 1, keys=["id"]).collect()
    }
    assert got == {(1, "delete"), (4, "insert")}


def test_snapshot_diff_null_and_map_columns_stable(spark, tmp_path):
    """ADVICE r2: the old md5(to_json(...)) content hash dropped null
    fields and serialized maps in nondeterministic key order, so
    identical rows could diff as spurious updates. xxhash64 over
    values (maps normalized to key-sorted entries) must report NO
    change for identical content, and must catch a null <-> value
    flip as a real update."""
    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    schema = "id long, val string, tags map<string,long>"
    rows_v0 = [
        (1, None, {"a": 1, "b": 2}),
        (2, "x", None),
        (3, None, None),
    ]
    # identical content, maps built in reverse insertion order
    rows_v1 = [
        (1, None, {"b": 2, "a": 1}),
        (2, "x", None),
        (3, "now-set", None),  # the one REAL update: null -> value
    ]
    t = str(tmp_path / "tbl")
    snapshot_write(
        spark, spark.createDataFrame(rows_v0, schema), t, mode="overwrite"
    )
    snapshot_write(
        spark, spark.createDataFrame(rows_v1, schema), t, mode="overwrite"
    )
    got = {
        (r.id, r._change)
        for r in snapshot_diff(spark, t, 0, 1, keys=["id"]).collect()
    }
    assert got == {(3, "update")}


def test_snapshot_diff_nested_maps_and_null_positions(spark, tmp_path):
    """Code-review round 3: (a) maps nested inside arrays/structs must
    hash (Spark rejects raw MapType at any depth — they are normalized
    recursively); (b) moving a value between columns, or flipping
    null <-> empty map, must register as an update (xxhash64 skips
    null children, so null positions are hashed explicitly)."""
    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    schema = (
        "id long, a string, b string, "
        "nest array<map<string,long>>, s struct<m:map<string,long>>"
    )
    rows_v0 = [
        (1, "x", None, [{"k": 1}], {"m": {"q": 2}}),
        (2, "y", "z", None, None),
        (3, None, None, [{"w": 9, "v": 8}], None),
    ]
    rows_v1 = [
        (1, None, "x", [{"k": 1}], {"m": {"q": 2}}),  # a/b swapped: UPDATE
        (2, "y", "z", [], None),                      # null -> []: UPDATE
        (3, None, None, [{"v": 8, "w": 9}], None),    # same map, reordered
    ]
    t = str(tmp_path / "tbl")
    snapshot_write(
        spark, spark.createDataFrame(rows_v0, schema), t, mode="overwrite"
    )
    snapshot_write(
        spark, spark.createDataFrame(rows_v1, schema), t, mode="overwrite"
    )
    got = {
        (r.id, r._change)
        for r in snapshot_diff(spark, t, 0, 1, keys=["id"]).collect()
    }
    assert got == {(1, "update"), (2, "update")}


def test_snapshot_diff_nested_null_positions_inside_structs_and_arrays(
    spark, tmp_path
):
    """ADVICE r3: null-position encoding must recurse. A struct column
    flipping ('x', NULL) -> (NULL, 'x'), an array ['x', NULL] ->
    [NULL, 'x'], and a map value swap {'a': NULL, 'b': 'x'} ->
    {'a': 'x', 'b': NULL} are all UPDATES (xxhash64 skips null
    children, so without recursive (isnull, value) tagging each pair
    hashes identically) — while rows whose nested content is merely
    reordered-equal stay unreported."""
    from wd2duckdb_spark.maintenance import snapshot_diff, snapshot_write

    t = str(tmp_path / "t")
    schema = (
        "id int, s struct<a:string,b:string>, arr array<string>, "
        "m map<string,string>"
    )
    v0 = spark.createDataFrame(
        [
            (1, ("x", None), ["x", None], {"a": None, "b": "x"}),
            (2, ("k", "l"), ["p", None], {"a": "v"}),  # unchanged row
        ],
        schema,
    )
    snapshot_write(spark, v0, t, mode="overwrite")
    v1 = spark.createDataFrame(
        [
            (1, (None, "x"), [None, "x"], {"a": "x", "b": None}),
            (2, ("k", "l"), ["p", None], {"a": "v"}),
        ],
        schema,
    )
    snapshot_write(spark, v1, t, mode="overwrite")

    got = {
        (r.id, r._change)
        for r in snapshot_diff(spark, t, 0, 1, keys=["id"]).collect()
    }
    assert got == {(1, "update")}
