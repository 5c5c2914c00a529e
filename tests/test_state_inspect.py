"""Checkpoint state introspection (streaming/state_inspect.py): the
Spark 4 state-metadata / statestore read sources over this package's
own stateful streams. The contract under test is stronger than
"reads something": the state read back from the checkpoint must EQUAL
the batch truth of the same input — state is the aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_DIR


def _rocksdb(spark):
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )


def _hdfs_provider(spark):
    """Pin the default HDFS-backed provider: the session-scoped
    providerClass conf LEAKS from any earlier RocksDB test, and the
    change-feed reader needs either HDFS delta files or RocksDB WITH
    changelog checkpointing — pin so this module is order-independent."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider",
    )


def _run_stream(out, name, ck, mode="update"):
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    q.stop()


@pytest.fixture()
def agg_checkpoint(spark, tmp_path):
    """A committed streaming-aggregate checkpoint over sf0.001 events
    (user_id → count/sum), plus the batch truth."""
    from wd2duckdb_spark.catalog import tbl

    _hdfs_provider(spark)
    e = (
        tbl(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 16)
        .select("user_id", "value")
    )
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    e.coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    s = spark.readStream.schema(e.schema).parquet(str(in_dir / "*"))
    agg = s.groupBy("user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )
    ck = tmp_path / "ck"
    _run_stream(agg, "si_agg", ck)
    truth = {
        r.user_id: (r.n, r.total)
        for r in e.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    return ck, truth


def test_streaming_agg_state_equals_batch_truth(spark, agg_checkpoint):
    from wd2duckdb_spark.streaming.state_inspect import read_state

    ck, truth = agg_checkpoint
    st = read_state(spark, str(ck))
    # flattened: key_user_id plus the aggregate buffer columns
    rows = st.collect()
    assert {c for c in st.columns if c.startswith("key_")} == {"key_user_id"}
    got = {}
    for r in rows:
        vals = [v for c, v in r.asDict().items() if c.startswith("value_")]
        # buffer layout: (count, sum) in declaration order
        got[r.key_user_id] = (vals[0], round(vals[1], 2))
    assert got == truth


def test_state_metadata_lists_the_operator(spark, agg_checkpoint):
    from wd2duckdb_spark.streaming.state_inspect import state_metadata

    ck, _ = agg_checkpoint
    md = state_metadata(spark, str(ck)).collect()
    names = {r.operatorName for r in md}
    assert "stateStoreSave" in names
    (row,) = [r for r in md if r.operatorName == "stateStoreSave"]
    assert row.maxBatchId >= 0 and row.numPartitions > 0


def test_state_profile_accounts_for_every_key(spark, agg_checkpoint):
    from wd2duckdb_spark.streaming.state_inspect import state_profile

    ck, truth = agg_checkpoint
    prof = state_profile(spark, str(ck)).collect()
    assert sum(r.n_keys for r in prof) == len(truth)
    assert abs(sum(r.share for r in prof) - 1.0) < 1e-6
    # hot partition first
    assert [r.n_keys for r in prof] == sorted(
        (r.n_keys for r in prof), reverse=True
    )


@pytest.mark.slow
def test_batch_id_time_travel(spark, tmp_path):
    """State AS OF batch N: feed two files through two micro-batches;
    batchId=0 must show only the first file's keys."""
    from wd2duckdb_spark.streaming.state_inspect import read_state

    _hdfs_provider(spark)
    df0 = spark.createDataFrame([(1, 1.0), (2, 2.0)], "k long, v double")
    df1 = spark.createDataFrame([(3, 3.0)], "k long, v double")
    in_dir = tmp_path / "tt_in"
    in_dir.mkdir()
    df0.coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    s = (
        spark.readStream.schema(df0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    agg = s.groupBy("k").agg(F.count("*").alias("n"))
    ck = tmp_path / "tt_ck"

    # memory sink cannot RESUME a checkpoint, and an append-mode file
    # sink rejects an unwatermarked aggregate — a foreachBatch no-op
    # sink supports both update mode and restart
    def _run_once():
        q = (
            # count() processes every partition, so every state store
            # commits (a true no-op fails commit validation)
            agg.writeStream.foreachBatch(lambda df, bid: (df.count(), None)[1])
            .outputMode("update")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    _run_once()
    df1.coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    _run_once()

    latest = {r.key_k for r in read_state(spark, str(ck)).collect()}
    asof0 = {
        r.key_k
        for r in read_state(spark, str(ck), batch_id=0).collect()
    }
    assert latest == {1, 2, 3}
    assert asof0 == {1, 2}


@pytest.mark.slow
def test_transform_with_state_variable_readback(spark, tmp_path):
    """transformWithStateInPandas checkpoints hold one store per
    typed variable; reading stateVarName='agg' back must equal the
    lifetime_value batch twin (state IS the aggregate — including the
    microsecond last_seen encoding the processor writes)."""
    pytest.importorskip("google.protobuf")
    _rocksdb(spark)
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.streaming.state_inspect import (
        read_state,
        state_metadata,
    )
    from wd2duckdb_spark.streaming.transform_state import (
        lifetime_value_batch,
        lifetime_value_stream,
    )

    e = (
        tbl(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 8)
        .select("user_id", "ts", "value")
    )
    in_dir = tmp_path / "tws_in"
    in_dir.mkdir()
    e.coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    s = spark.readStream.schema(e.schema).parquet(str(in_dir / "*"))
    ck = tmp_path / "tws_ck"
    _run_stream(lifetime_value_stream(s), "si_tws", ck)

    md = state_metadata(spark, str(ck)).collect()
    props = md[0].operatorProperties
    assert '"stateName":"agg"' in props.replace(" ", "")

    st = read_state(spark, str(ck), state_var="agg")
    got = {
        r.key_user_id: (r.value_n, round(r.value_v, 2), r.value_last_seen_us)
        for r in st.collect()
    }
    want = {
        r.user_id: (
            r.n_events,
            round(r.total_value, 2),
            int(r.last_seen.timestamp() * 1_000_000),
        )
        for r in lifetime_value_batch(e).collect()
    }
    assert got == want


@pytest.mark.slow
def test_registered_timers_readback_open_sessions(spark, tmp_path):
    """session_timer_stream registers one event-time timer per OPEN
    session; the checkpoint's timer registry must list exactly the
    users whose sessions the watermark has not yet sealed, at expiry
    session_end + gap."""
    pytest.importorskip("google.protobuf")
    _rocksdb(spark)
    from wd2duckdb_spark.catalog import tbl
    from wd2duckdb_spark.streaming.state_inspect import read_timers
    from wd2duckdb_spark.streaming.typed_state import (
        _GAP_US,
        session_timer_stream,
    )

    e = (
        tbl(spark, SF_DIR, "events")
        .filter(F.col("user_id") < 8)
        .select("ts", "event_id", "user_id", "value")
    )
    in_dir = tmp_path / "tm_in"
    in_dir.mkdir()
    e.coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    s = spark.readStream.schema(e.schema).parquet(str(in_dir / "*"))
    ck = tmp_path / "tm_ck"
    _run_stream(session_timer_stream(s), "si_timers", ck, mode="append")

    # availableNow runs a final no-data batch whose watermark is
    # global_max_ts - 30min: every session whose timer (last_end +
    # gap) fell at or before it has ALREADY sealed and dropped its
    # timer. Pending timers must be exactly the users whose last
    # session is still open under that watermark.
    last_end_us = {
        r.user_id: int(r.last_end.timestamp() * 1_000_000)
        for r in e.groupBy("user_id").agg(F.max("ts").alias("last_end")).collect()
    }
    wm_us = max(last_end_us.values()) - 30 * 60 * 1_000_000
    open_users = {
        u for u, end in last_end_us.items() if end + _GAP_US > wm_us
    }
    timers = read_timers(spark, str(ck)).collect()
    assert open_users  # the max-ts user is always open
    assert {t.key_user_id for t in timers} == open_users
    for t in timers:
        # ceil-to-ms + 1 registration: the timer may never fire
        # before the true microsecond seal point (typed_state._seal)
        want_ms = (last_end_us[t.key_user_id] + _GAP_US) // 1000 + 1
        assert t.expiration_timestamp_ms == want_ms


def test_state_change_feed_is_the_cdc_of_the_store(spark, tmp_path):
    """Change feed over two micro-batches of a streaming aggregate:
    batch 0 emits an update per first-file key, batch 1 only for keys
    the second file touches; replaying updates in batch order must
    reconstruct the final store exactly."""
    from wd2duckdb_spark.streaming.state_inspect import (
        read_state,
        state_changes,
    )

    _hdfs_provider(spark)
    df0 = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (2, 3.0)], "k long, v double"
    )
    df1 = spark.createDataFrame([(2, 4.0), (3, 5.0)], "k long, v double")
    in_dir = tmp_path / "cf_in"
    in_dir.mkdir()
    df0.coalesce(1).write.parquet(str(in_dir / "b0.parquet"))
    s = (
        spark.readStream.schema(df0.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir / "*"))
    )
    agg = s.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("t"))
    ck = tmp_path / "cf_ck"

    def _run_once():
        q = (
            agg.writeStream.foreachBatch(lambda df, bid: (df.count(), None)[1])
            .outputMode("update")
            .option("checkpointLocation", str(ck))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        q.stop()

    _run_once()
    df1.coalesce(1).write.parquet(str(in_dir / "b1.parquet"))
    _run_once()

    feed = state_changes(spark, str(ck), 0).collect()
    assert {r.change_type for r in feed} == {"update"}
    by_batch = {}
    for r in feed:
        by_batch.setdefault(r.batch_id, set()).add(r.key_k)
    assert by_batch == {0: {1, 2}, 1: {2, 3}}

    # replay updates in batch order == final store (aggregate buffer
    # columns keep engine-internal names — read value_* positionally)
    def _vals(r):
        return tuple(v for c, v in r.asDict().items() if c.startswith("value_"))

    replayed = {}
    for r in sorted(feed, key=lambda r: r.batch_id):
        replayed[r.key_k] = _vals(r)
    final = {
        r.key_k: _vals(r) for r in read_state(spark, str(ck)).collect()
    }
    assert replayed == final


def test_join_side_state_holds_buffered_rows(spark, tmp_path):
    """Stream-stream join checkpoints keep one store per side;
    joinSide='left'/'right' must expose each side's buffered rows —
    the user-visible answer to "why is my join state growing" —
    and together they account for every input row still inside the
    watermark horizon."""
    from wd2duckdb_spark.streaming.joins import attribute_purchases
    from wd2duckdb_spark.streaming.state_inspect import read_state

    _hdfs_provider(spark)
    base = [
        (1, 100, "2024-01-01 10:00:00", 1.0),
        (1, 101, "2024-01-01 10:10:00", 2.0),
        (2, 102, "2024-01-01 10:05:00", 3.0),
    ]
    purch = [
        (1, 200, "2024-01-01 10:15:00", 9.0),
        (2, 201, "2024-01-01 10:06:00", 8.0),
    ]
    schema = "user_id long, event_id long, ts string, value double"

    def _stream(rows, sub):
        df = spark.createDataFrame(rows, schema).select(
            "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
            "value",
        )
        d = tmp_path / sub
        d.mkdir()
        df.coalesce(1).write.parquet(str(d / "b0.parquet"))
        return spark.readStream.schema(df.schema).parquet(str(d / "*"))

    out = attribute_purchases(
        _stream(base, "clicks"), _stream(purch, "purch")
    )
    ck = tmp_path / "ss_ck"
    _run_stream(out, "si_join", ck, mode="append")

    left = read_state(spark, str(ck), join_side="left").collect()
    right = read_state(spark, str(ck), join_side="right").collect()
    # every input row within the 1-hour watermark horizon stays
    # buffered in its side's store (nothing here is old enough to
    # expire in a single availableNow run)
    # join stores key by the equi-key tuple (generic field names);
    # the buffered row's own columns live in value_*
    assert {(r.value_c_user, r.value_click_id) for r in left} == {
        (1, 100), (1, 101), (2, 102)
    }
    assert {(r.value_p_user, r.value_purchase_id) for r in right} == {
        (1, 200), (2, 201)
    }
