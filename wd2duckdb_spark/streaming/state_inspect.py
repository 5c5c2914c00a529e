"""Checkpoint state introspection: the Spark 4 state data source.

Every stateful stream in this package (windowed aggregates,
dropDuplicates, stream-stream joins, applyInPandasWithState,
transformWithStateInPandas, the dedup-at-ingest foreachBatch index)
persists operator state under its checkpoint. In production the
questions that state raises are operational: *how many keys am I
holding? is one partition hot? what exactly does the store believe
about key X after batch N?* Spark 4 answers them with two read-only
DataFrame sources over the checkpoint — ``state-metadata`` (operator
inventory) and ``statestore`` (the keys/values themselves) — wrapped
here with flattening, typed-state addressing, and a skew profile.

Offline state reads, not a running query: the sources scan the
checkpoint's commit log + store files directly (RocksDB SST /
HDFS-backed), partition-parallel, so profiling a 1000-partition store
on a cluster is one narrow scan — no replay of the stream and no
interference with the live query. That is the 100 TB shape: state
size is bounded by live keys, and this reader parallelizes over the
store's own partitioning.

Reference parity note: wd2duckdb's single process has no equivalent —
its only "state" is the output DuckDB file. This module covers the
operational surface a Spark deployment of the same pipeline actually
needs (SURVEY.md §2.3 streaming row; the state sources are public
Spark 4 features, SPARK-45511).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator inventory of a checkpoint: one row per stateful
    operator × store with (operatorId, operatorName, stateStoreName,
    numPartitions, minBatchId, maxBatchId, operatorProperties — the
    JSON carrying each transformWithState variable's name/type/TTL).
    The first stop: everything `read_state` needs to address a store
    is listed here."""
    return spark.read.format("state-metadata").load(checkpoint)


def read_state(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int | None = None,
    store_name: str | None = None,
    state_var: str | None = None,
    batch_id: int | None = None,
    join_side: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Read a state store as a DataFrame (grouping key → state value,
    plus the store partition that owns the key).

    - ``operator_id`` / ``store_name``: address one operator's store
      when the query has several (defaults: 0 / "default").
    - ``state_var``: a transformWithStateInPandas variable name (e.g.
      ``"agg"``, ``"recent"``, ``"counts"`` from typed_state.py) —
      required for TWS checkpoints, which hold one store per typed
      variable.
    - ``batch_id``: time-travel to the state AS OF that micro-batch
      (default: latest committed). Pairs with the replay/idempotency
      story in dedup_ingest: state at batch N is inspectable after
      the fact.
    - ``join_side``: ``"left"``/``"right"`` for stream-stream join
      state (joins.attribute_purchases), which keeps per-side stores.
    - ``flatten``: explode the (key, value) structs into
      ``key_*`` / ``value_*`` columns so the result joins/aggregates
      like any table; the raw nested form is what the source emits.
    """
    reader = spark.read.format("statestore")
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    if state_var is not None:
        reader = reader.option("stateVarName", state_var)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    if join_side is not None:
        reader = reader.option("joinSide", join_side)
    df = reader.load(checkpoint)
    return _flatten(df) if flatten else df


def read_timers(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int | None = None,
    batch_id: int | None = None,
    flatten: bool = True,
) -> DataFrame:
    """Read a transformWithState checkpoint's REGISTERED TIMERS (one
    row per pending per-key timer: grouping key + expiry timestamp).
    The ops question this answers for timer-driven operators like
    typed_state.session_timer_stream: *which sessions are still open,
    and when will they seal?* — the checkpoint knows, no replay."""
    reader = spark.read.format("statestore").option(
        "readRegisteredTimers", "true"
    )
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if batch_id is not None:
        reader = reader.option("batchId", batch_id)
    df = reader.load(checkpoint)
    return _flatten(df) if flatten else df


def state_changes(
    spark: SparkSession,
    checkpoint: str,
    start_batch: int,
    end_batch: int | None = None,
    *,
    operator_id: int | None = None,
    store_name: str | None = None,
    flatten: bool = True,
) -> DataFrame:
    """The state CHANGE FEED between two micro-batches: one row per
    (batch_id, change_type ∈ {update, delete}, key, value) — CDC over
    the store itself. Where :func:`read_state` answers "what does the
    store hold NOW (or as of batch N)", this answers "what did batch
    N..M DO to it" — the audit trail for debugging a wrong streaming
    result after the fact, and the incremental feed for mirroring
    state into an external system without replaying input."""
    reader = (
        spark.read.format("statestore")
        .option("readChangeFeed", "true")
        .option("changeStartBatchId", start_batch)
    )
    if end_batch is not None:
        reader = reader.option("changeEndBatchId", end_batch)
    if operator_id is not None:
        reader = reader.option("operatorId", operator_id)
    if store_name is not None:
        reader = reader.option("storeName", store_name)
    df = reader.load(checkpoint)
    return _flatten(df) if flatten else df


def _flatten(df: DataFrame) -> DataFrame:
    """Explode (key, value) structs into key_* / value_* columns."""
    cols: list = []
    for field in df.schema:
        if field.name in ("key", "value") and field.dataType.typeName() == "struct":
            cols.extend(
                F.col(f"{field.name}.{sub.name}").alias(
                    f"{field.name}_{sub.name}"
                )
                for sub in field.dataType.fields
            )
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def state_profile(
    spark: SparkSession,
    checkpoint: str,
    *,
    operator_id: int | None = None,
    store_name: str | None = None,
    state_var: str | None = None,
) -> DataFrame:
    """Per-partition key counts for one store — the state-skew audit.

    One narrow aggregate over the store scan: (partition_id, n_keys),
    plus every partition's share of the total. A healthy store is
    near-uniform (HashPartitioner over the grouping key); a partition
    holding a disproportionate share means hot grouping keys, and at
    cluster scale that partition's executor is the one that OOMs or
    lags — the streaming analogue of the skew the batch tier treats
    with operators/skew.py. Sorted by n_keys descending so the hot
    partition is row one."""
    st = read_state(
        spark,
        checkpoint,
        operator_id=operator_id,
        store_name=store_name,
        state_var=state_var,
        flatten=False,
    )
    counts = st.groupBy("partition_id").agg(F.count("*").alias("n_keys"))
    total = F.sum("n_keys").over(Window.partitionBy())
    return (
        counts.withColumn(
            "share", F.round(F.col("n_keys") / total, 4)
        ).orderBy(F.col("n_keys").desc(), "partition_id")
    )
