"""Persisted IVF ANN index with ingest-time maintenance (VERDICT r10
item 2).

The session-memoized IVF path (:mod:`wd2duckdb_spark.functions.
similarity` — ``q_ivf_ann_topk``) re-derives every vector's cell
assignment from the full embeddings table on each query: correct, but
the "index" dies with the session. Production similarity search
builds the index ONCE (train on a sample, write assignments + the
centroid table to the lake) and maintains it AT INGEST — exactly the
protocol the dedup tier already has for its MinHash band-key index
(streaming/dedup_ingest.py). This module is that protocol applied to
IVF:

- :func:`ivf_index_write` — bootstrap: assign every existing vector
  to its nearest-centroid cell and persist

  - ``<index_dir>/centroids`` — the (cid, embedding) centroid table
    (broadcast-sized by construction: n_cells rows);
  - ``<index_dir>/assignments/batch=-1/cell=<c>/…`` — one row per
    vector: (vec_id, v float64[], nv precomputed L2 norm, optional PQ
    codes), HIVE-PARTITIONED BY CELL so a probe's ``cell IN (…)``
    prunes at the DIRECTORY level — the query scans nprobe/n_cells of
    the data without opening a single out-of-cell file (plan-pinned:
    PartitionFilters, tests/test_ann_index.py). ``batch=-1`` marks
    the bootstrap; stream batches take 0, 1, 2, …

- :func:`ann_index_ingest` / :func:`ann_ingest_stream` — maintenance:
  each micro-batch of new vectors is assigned against the PERSISTED
  centroids (read once per session per index — memoized; the
  assignment rule therefore cannot drift between bootstrap and
  stream) and overwrite-written to ``assignments/batch=<id>`` — the
  same replay-idempotent protocol as the dedup index: a replayed
  micro-batch (restart after crash) rewrites its own partition
  instead of duplicating it.

- :func:`ivf_index_probe` — query: nprobe nearest cells are picked
  DRIVER-SIDE from the tiny centroid table, and the assignments scan
  is filtered on those cell ids (partition pruning); scoring reuses
  the STORED vector + norm, so the cosine doubles are bit-identical
  to the from-scratch path (parity pinned across micro-batch layouts
  in tests/test_ann_index.py, and the registered query shares
  ``q_ivf_ann_topk``'s DuckDB oracle verbatim).

Scale posture: the bootstrap is one linear pass — assign is a
per-row expression over broadcast-sized centroid literals, and the
partitionBy("cell") write is TASK-LOCAL (no shuffle: each task
splits its rows across cell directories; file count is then
tasks×cells, which :func:`compact_ann_index` folds offline);
maintenance cost is per-batch-linear; probes read nprobe cells
regardless of corpus size.
The centroid set is FROZEN at bootstrap (the standard IVF contract —
FAISS-style indexes retrain/rebuild offline; cell-balance drift is
observable via ``q_ivf_cell_balance`` on the index itself).

Reference parity note: the reference engine (wd2duckdb) has no vector
tier; this is part of the LLM-pipeline surface the task brief adds on
top (SURVEY §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import register_memo, session_key, tbl
from wd2duckdb_spark.functions.similarity import (
    EMB_DIM,
    IVF_CENTROID_IDS,
    IVF_NPROBE,
    _as_double,
    _centroids,
    _dot_fold_sql,
    _ivf_oracle,
    _py_norm,
    _sql_arr,
    clean_embeddings,
    ivf_assign_col,
    norm,
    pq_code_col,
    query_vector,
)

#: (applicationId, index_dir) → [(cid, vector)] — the persisted
#: centroid table is immutable after bootstrap (frozen-centroid
#: contract), so one bounded collect per session serves every
#: micro-batch assignment and every probe.
_index_cent_cache: dict = register_memo({})


def _index_centroids(
    spark: SparkSession, index_dir: str
) -> list[tuple[int, list[float]]]:
    key = (session_key(spark), index_dir)
    cached = _index_cent_cache.get(key)
    if cached is not None:
        return cached
    rows = spark.read.parquet(f"{index_dir}/centroids").collect()
    out = sorted(
        (int(r["cid"]), [float(x) for x in r["embedding"]]) for r in rows
    )
    _index_cent_cache[key] = out
    return out


def l2_assign_col(
    vec_sql: str, cents: list[tuple[int, list[float]]]
) -> Column:
    """Nearest-centroid cell by FLOOR-6 SQUARED-L2 argmin — the
    Lloyd assignment rule (similarity._lloyd_assignment: dist =
    floor6(sqdist), min-struct (dist, cid)) as one in-row expression,
    numerics matched term-for-term: zip_with + ascending-dim left
    fold from 0.0 for the squared distance, floor(d·1e6 + 0.5)/1e6
    snap, strict `<` scan in ascending-cid order = smallest cid on
    ties. An index bootstrapped from ``trained_centroids()`` with
    ``assign="l2"`` therefore reproduces the registered
    ``semantic_dedup`` clustering EXACTLY (pinned in
    tests/test_ann_dedup_ingest.py)."""
    dists = ", ".join(
        f"FLOOR(aggregate(zip_with({vec_sql}, {_sql_arr(c)},"
        f" (x, y) -> (x - y) * (x - y)),"
        f" CAST(0.0 AS DOUBLE), (acc, w) -> acc + w)"
        f" * 1000000.0 + 0.5) / 1000000.0"
        for _cid, c in cents
    )
    cids = ", ".join(str(cid) for cid, _c in cents)
    return F.expr(
        f"aggregate(zip_with(array({dists}), array({cids}),"
        " (d, c) -> named_struct('d', d, 'c', c)),"
        " named_struct('d', CAST('Infinity' AS DOUBLE), 'c', -1),"
        " (acc, e) -> IF(e.d < acc.d, e, acc)).c"
    )


#: Filterable metadata columns stored alongside each vector when the
#: source frame has them — production filtered search (label/tenant/
#: date predicates) must evaluate against the INDEX, not a join back
#: to the source table.
INDEX_ATTR_COLS = ("label",)


def _assigned_rows(
    vecs: DataFrame,
    cents: list[tuple[int, list[float]]],
    codebook: list[list[float]] | None,
    assign: str = "cosine",
) -> DataFrame:
    """(vec_id, v, nv, [attrs,] [code0..7,] cell) for one frame of
    vectors — the single assignment rule shared by bootstrap and
    ingest. :data:`INDEX_ATTR_COLS` present in the input are stored
    so probes can filter without rejoining the source. ``assign``
    selects the cell rule: ``cosine`` (IVF default) or ``l2`` (the
    Lloyd/SemDeDup rule, :func:`l2_assign_col`)."""
    from wd2duckdb_spark.functions.similarity import PQ_SUBSPACES

    cell = (
        ivf_assign_col("v", "nv", cents)
        if assign == "cosine"
        else l2_assign_col("v", cents)
    )
    if assign not in ("cosine", "l2"):
        raise ValueError(f"unknown assign rule {assign!r}")
    out = (
        vecs.filter(
            F.col("embedding").isNotNull()
            & (F.size("embedding") == EMB_DIM)  # schema contract
        )
        .withColumn("v", _as_double(F.col("embedding")))
        .withColumn("nv", norm(F.col("v")))
        .withColumn("cell", cell)
    )
    cols = ["vec_id", "v", "nv"]
    cols += [c for c in INDEX_ATTR_COLS if c in vecs.columns]
    if codebook is not None:
        out = out.withColumns(
            {
                f"code{j}": pq_code_col("v", codebook, j)
                for j in range(PQ_SUBSPACES)
            }
        )
        return out.select(
            *cols, *[f"code{j}" for j in range(PQ_SUBSPACES)], "cell"
        )
    return out.select(*cols, "cell")


def ivf_index_write(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    codebook: list[list[float]] | None = None,
    centroids: list[tuple[int, list[float]]] | None = None,
    assign: str = "cosine",
) -> None:
    """Bootstrap the persisted IVF index from the embeddings table:
    centroid table + cell-partitioned assignments under
    ``batch=-1``. ``codebook`` (optional) additionally stores the 8
    PQ codes per vector — the compressed-candidate tier an ADC probe
    reads instead of the float vectors. ``centroids`` (optional)
    supplies TRAINED centroids — e.g.
    :func:`wd2duckdb_spark.functions.similarity.trained_centroids`,
    the Lloyd k-means output — instead of the deterministic
    seed-vector stand-in; index/probe mechanics are identical either
    way, and once written the index carries its own centroid table,
    so probes and ingest never need to know which training produced
    it."""
    cents = centroids if centroids is not None else _centroids(spark, sf_dir)
    if not cents:
        raise ValueError(f"no trainable centroids in {sf_dir}")
    spark.createDataFrame(
        [(cid, vec) for cid, vec in cents],
        "cid int, embedding array<double>",
    ).coalesce(1).write.mode("error").parquet(f"{index_dir}/centroids")
    (
        _assigned_rows(
            tbl(spark, sf_dir, "embeddings"), cents, codebook, assign
        )
        .write.mode("error")
        .partitionBy("cell")
        .parquet(f"{index_dir}/assignments/batch=-1")
    )


def ann_index_ingest(
    batch_df: DataFrame, batch_id: int, index_dir: str
) -> None:
    """foreachBatch hook: assign one micro-batch of new vectors
    against the persisted centroids and overwrite-write its
    ``batch=<id>`` partition (replay-idempotent — a restarted batch
    rewrites its own output). PQ codes are intentionally NOT derived
    here unless the bootstrap stored them: mixed layouts would make
    ADC probes silently partial. The presence check reads the
    bootstrap's code columns once per session (schema probe, no
    data read).

    A per-batch accounting sidecar (the streaming face of the
    reference's progress reporting, same protocol as the dedup
    tier's ``_metrics``) records arrivals vs indexed rows — the
    difference is the schema-contract quarantine (NULL/ragged
    vectors), the number an index operator watches for feed rot.
    Underscore dir, invisible to assignments readers; overwrite
    keeps replays idempotent like the data write."""
    spark = batch_df.sparkSession
    cents = _index_centroids(spark, index_dir)
    codebook = _index_codebook_if_stored(spark, index_dir)
    batch_df = batch_df.persist()  # feeds the assign AND the count
    try:
        assigned = _assigned_rows(batch_df, cents, codebook).persist()
        try:
            assigned.write.mode("overwrite").partitionBy("cell").parquet(
                f"{index_dir}/assignments/batch={batch_id}"
            )
            n_in = batch_df.count()
            n_indexed = assigned.count()
            spark.createDataFrame(
                [(batch_id, n_in, n_indexed, n_in - n_indexed)],
                "batch_id long, n_in long, n_indexed long, n_quarantined long",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{index_dir}/_metrics/batch={batch_id}"
            )
        finally:
            assigned.unpersist()
    finally:
        batch_df.unpersist()


def ann_index_metrics(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-micro-batch index-maintenance accounting (n_in / n_indexed
    / n_quarantined per batch) — read it to monitor dirty-vector rate
    over time or reconcile totals against the assignments table
    (``sum(n_indexed) == count(assignments) − bootstrap``, asserted
    in tests)."""
    return (
        spark.read.parquet(f"{index_dir}/_metrics")
        .select("batch_id", "n_in", "n_indexed", "n_quarantined")
        .orderBy("batch_id")
    )


def index_cell_balance(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-cell load diagnostic over the PERSISTED index — the
    index-artifact twin of ``q_ivf_cell_balance`` (which recomputes
    assignments from the embeddings table): rows per cell, share, and
    multiple-of-mean, answering "did ingest drift skew a cell past
    what nprobe-bounded probes can hide". One partition-column
    aggregate: reads parquet FOOTERS' worth of data per cell, never
    the vectors."""
    a = spark.read.parquet(f"{index_dir}/assignments").select("cell")
    counts = a.groupBy("cell").agg(F.count("*").alias("n_vectors"))
    tot = counts.agg(
        F.sum("n_vectors").alias("_t"), F.count("*").alias("_c")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            "n_vectors",
            F.round(F.col("n_vectors") / F.col("_t"), 4).alias("share"),
            F.round(
                F.col("n_vectors") / (F.col("_t") / F.col("_c")), 4
            ).alias("x_mean"),
        )
        .orderBy("cell")
    )


#: (applicationId, index_dir) → codebook or None, resolved from the
#: bootstrap's sidecar (written iff codes are stored).
_index_cb_cache: dict = register_memo({})


def _index_codebook_if_stored(
    spark: SparkSession, index_dir: str
) -> list[list[float]] | None:
    key = (session_key(spark), index_dir)
    if key in _index_cb_cache:
        return _index_cb_cache[key]
    jvm = spark._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(f"{index_dir}/codebook")
    fs = p.getFileSystem(hconf)
    cb = None
    if fs.exists(p):
        rows = spark.read.parquet(f"{index_dir}/codebook").collect()
        cb = [
            [float(x) for x in r["vec"]]
            for r in sorted(rows, key=lambda r: r["code"])
        ]
    _index_cb_cache[key] = cb
    return cb


def write_index_codebook(
    spark: SparkSession, index_dir: str, codebook: list[list[float]]
) -> None:
    """Persist the PQ codebook alongside the index so ingest batches
    (and later sessions) encode with EXACTLY the bootstrap's
    codebook."""
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(codebook)],
        "code int, vec array<double>",
    ).coalesce(1).write.mode("error").parquet(f"{index_dir}/codebook")


def ann_ingest_stream(
    vecs: DataFrame,
    index_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start index maintenance over a streaming embeddings source
    (schema: vec_id + embedding, extra columns pass through the
    filter untouched); returns the StreamingQuery. The index must be
    bootstrapped first (:func:`ivf_index_write`) — the first batch's
    centroid read fails fast otherwise, which is the correct contract
    (assigning against nothing would silently invent an empty
    index)."""

    def _fn(batch_df: DataFrame, batch_id: int) -> None:
        ann_index_ingest(batch_df, batch_id, index_dir)

    writer = vecs.writeStream.foreachBatch(_fn).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def ivf_index_probe(
    spark: SparkSession,
    index_dir: str,
    qv: list[float],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    exclude_ids: tuple[int, ...] = (),
    pred: Column | None = None,
) -> DataFrame:
    """Top-``k`` cosine over the persisted index: nprobe cells picked
    driver-side from the centroid table, assignments scanned with the
    cell filter (partition pruning — only those directories are
    read), cosine recomputed from the STORED (v, nv) so the doubles
    match the from-scratch IVF path bit-for-bit.

    ``pred`` is the FILTERED-search predicate over the stored
    :data:`INDEX_ATTR_COLS` (e.g. ``F.col("label") == 3``): it
    evaluates against the index itself — pushed into the pruned-cell
    parquet scan, never a join back to the source table. Because cell
    assignment is per-row, filtering at probe time selects exactly
    the vectors the from-scratch pre-filter path
    (``ivf_topk(pred=…)``) scores — parity pinned in tests."""
    cents = _index_centroids(spark, index_dir)
    if not cents or not qv:
        return spark.range(0).select(
            F.col("id").alias("vec_id"),
            F.lit(0).cast("bigint").alias("cell"),
            F.lit(0.0).alias("cosine"),
        )

    def _cos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        return d / (_py_norm(a) * _py_norm(b))

    probe = [
        cid
        for cid, _ in sorted(
            ((cid, _cos(qv, c)) for cid, c in cents),
            key=lambda t: (-t[1], t[0]),
        )[:nprobe]
    ]
    a = spark.read.parquet(f"{index_dir}/assignments").filter(
        F.col("cell").isin(*probe)
    )
    if pred is not None:
        a = a.filter(pred)
    if exclude_ids:
        a = a.filter(~F.col("vec_id").isin(*exclude_ids))
    sim = F.round(
        F.expr(_dot_fold_sql("v", _sql_arr(qv)))
        / (F.col("nv") * F.lit(_py_norm(qv))),
        6,
    )
    return (
        a.select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            sim.alias("cosine"),
        )
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(k)
    )


def pq_index_adc_topk(
    spark: SparkSession,
    index_dir: str,
    qv: list[float],
    k: int = 10,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """ADC top-``k`` from STORED PQ codes (requires a bootstrap with
    ``codebook``): candidates never rehydrate to floats — 8
    lookup-table reads + adds per row over the code columns, the
    billion-vector memory tier. Scans ALL cells (ADC is the
    whole-corpus compressed pass; compose with the cell filter for
    IVF+PQ). floor-normalized distances — same convention as
    ``q_pq_adc_topk``, whose results this reproduces from the index
    (pinned in tests)."""
    from wd2duckdb_spark.functions.similarity import PQ_SUBSPACES, _pq_lut

    codebook = _index_codebook_if_stored(spark, index_dir)
    if codebook is None:
        raise ValueError(
            f"{index_dir} stores no PQ codes — bootstrap with codebook="
        )
    lut = _pq_lut(qv, codebook)
    a = spark.read.parquet(f"{index_dir}/assignments")
    if exclude_ids:
        a = a.filter(~F.col("vec_id").isin(*exclude_ids))
    dist = F.expr(
        " + ".join(
            f"element_at(array({', '.join(repr(x) for x in lut[j])}),"
            f" code{j} + 1)"
            for j in range(PQ_SUBSPACES)
        )
    )
    return (
        a.select(
            "vec_id",
            (F.floor(dist * 1000000 + F.lit(0.5)) / 1000000).alias(
                "adc_dist"
            ),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )


def ivf_pq_index_probe(
    spark: SparkSession,
    index_dir: str,
    qv: list[float],
    k: int = 10,
    nprobe: int = IVF_NPROBE,
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """IVF+PQ composed probe — the FAISS-default billion-vector
    shape: partition pruning cuts the scan to ``nprobe`` cells, then
    ADC over the STORED codes scores the survivors without ever
    rehydrating float vectors. Requires a bootstrap with
    ``codebook=``. Result = the plain ADC ranking restricted to the
    probe cells (pinned in tests against exactly that restriction);
    like all IVF paths it trades recall for the nprobe/n_cells scan
    bound."""
    from wd2duckdb_spark.functions.similarity import PQ_SUBSPACES, _pq_lut

    codebook = _index_codebook_if_stored(spark, index_dir)
    if codebook is None:
        raise ValueError(
            f"{index_dir} stores no PQ codes — bootstrap with codebook="
        )
    cents = _index_centroids(spark, index_dir)

    def _cos(a: list[float], b: list[float]) -> float:
        return sum(x * y for x, y in zip(a, b)) / (
            _py_norm(a) * _py_norm(b)
        )

    probe = [
        cid
        for cid, _ in sorted(
            ((cid, _cos(qv, c)) for cid, c in cents),
            key=lambda t: (-t[1], t[0]),
        )[:nprobe]
    ]
    lut = _pq_lut(qv, codebook)
    a = spark.read.parquet(f"{index_dir}/assignments").filter(
        F.col("cell").isin(*probe)
    )
    if exclude_ids:
        a = a.filter(~F.col("vec_id").isin(*exclude_ids))
    dist = F.expr(
        " + ".join(
            f"element_at(array({', '.join(repr(x) for x in lut[j])}),"
            f" code{j} + 1)"
            for j in range(PQ_SUBSPACES)
        )
    )
    return (
        a.select(
            "vec_id",
            F.col("cell").cast("bigint").alias("cell"),
            (F.floor(dist * 1000000 + F.lit(0.5)) / 1000000).alias(
                "adc_dist"
            ),
        )
        .orderBy("adc_dist", "vec_id")
        .limit(k)
    )


#: Partition value of the bootstrap/archive tier. Structured
#: Streaming batch ids start at 0, so -1 never collides with a live
#: batch (same convention as the dedup index's ARCHIVE_BATCH).
BOOTSTRAP_BATCH = -1


def compact_ann_index(
    spark: SparkSession, index_dir: str, through_batch: int
) -> None:
    """Fold every assignments ``batch=<id>`` partition with id ≤
    ``through_batch`` (plus the bootstrap) into ONE ``batch=-1``
    partition, preserving the ``cell`` sub-partitioning the probe's
    directory pruning depends on — the ANN face of the dedup tier's
    ``archive_index``: after B micro-batches the probe otherwise
    lists B×n_cells directories. Batches later than ``through_batch``
    pass through untouched (they may still be replayed by a restarted
    stream; the stream must be STOPPED past ``through_batch`` when
    this runs — same offline contract as the dedup archive).
    Idempotent: re-folding with the same ``through_batch`` rewrites
    the same rows into the same layout. Crash-safe via the shared
    staging swap (:func:`wd2duckdb_spark.maintenance.swap_in`)."""
    from wd2duckdb_spark.maintenance import swap_in

    path = f"{index_dir}/assignments"
    a = spark.read.parquet(path)
    folded = a.withColumn(
        "batch",
        F.when(
            F.col("batch") <= through_batch, F.lit(BOOTSTRAP_BATCH)
        ).otherwise(F.col("batch")),
    )
    tmp = path.rstrip("/") + "._compact"
    backup = path.rstrip("/") + "._precompact"
    (
        folded.repartition("batch", "cell")
        .write.mode("overwrite")
        .partitionBy("batch", "cell")
        .parquet(tmp)
    )
    swap_in(spark, path, tmp, backup, op="compact_ann_index")


# ---------------------------------------------------------------------------
# Registered query — the index path under the driver's oracle gate
# ---------------------------------------------------------------------------

#: (applicationId, sf_dir) → index_dir of a bootstrap built from the
#: fixture embeddings in a session tempdir; built once per session so
#: the registered query exercises the REAL write→probe round trip
#: without re-writing per invocation.
_fixture_index_cache: dict = register_memo({})


def _fixture_index(spark: SparkSession, sf_dir: str) -> str:
    key = (session_key(spark), sf_dir)
    cached = _fixture_index_cache.get(key)
    if cached is not None:
        return cached
    import tempfile

    index_dir = tempfile.mkdtemp(prefix="wd2duckdb_spark_ann_index_")
    # mkdtemp creates the dir; Spark's mode="error" needs the TARGETS
    # absent, which they are (subpaths of the fresh dir)
    ivf_index_write(spark, sf_dir, index_dir)
    _fixture_index_cache[key] = index_dir
    return index_dir


def q_ann_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 of vec_id=0 served FROM THE PERSISTED INDEX — same
    semantics (and the same DuckDB oracle, verbatim) as
    ``q_ivf_ann_topk``, but the plan reads the cell-partitioned
    assignments table with partition pruning on the probe cells
    instead of re-assigning the whole embeddings scan. The exclusion
    set (query vector + centroid seed ids) mirrors the from-scratch
    query so the two paths are row-identical."""
    qv = query_vector(spark, sf_dir, 0)
    if not qv or not _centroids(spark, sf_dir):
        # degenerate corpus: no probe vector or no trainable
        # centroids — the oracle's count guards empty it identically
        return tbl(spark, sf_dir, "embeddings").limit(0).select(
            "vec_id",
            F.lit(0).cast("bigint").alias("cell"),
            F.lit(0.0).alias("cosine"),
        )
    index_dir = _fixture_index(spark, sf_dir)
    return ivf_index_probe(
        spark,
        index_dir,
        qv,
        k=10,
        exclude_ids=(0, *IVF_CENTROID_IDS),
    )


def q_ann_index_filtered_probe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILTERED search served from the persisted index: cosine top-10
    among ``label = ANN_FILTER_LABEL`` vectors inside the query's
    nprobe cells, the predicate evaluated against the index's STORED
    label column (pushed into the pruned-cell scan — no join back to
    the source). Row-identical to the from-scratch pre-filter path
    ``q_ann_filtered_ivf`` and shares its oracle verbatim."""
    from wd2duckdb_spark.functions.similarity import ANN_FILTER_LABEL

    qv = query_vector(spark, sf_dir, 0)
    if not qv or not _centroids(spark, sf_dir):
        return tbl(spark, sf_dir, "embeddings").limit(0).select(
            "vec_id",
            F.lit(0).cast("bigint").alias("cell"),
            F.lit(0.0).alias("cosine"),
        )
    index_dir = _fixture_index(spark, sf_dir)
    return ivf_index_probe(
        spark,
        index_dir,
        qv,
        k=10,
        exclude_ids=(0, *IVF_CENTROID_IDS),
        pred=F.col("label") == ANN_FILTER_LABEL,
    )


QUERIES = {
    "ann_index_probe": q_ann_index_probe,
    "ann_index_filtered_probe": q_ann_index_filtered_probe,
}


def _filtered_oracle() -> str:
    from wd2duckdb_spark.functions.similarity import ANN_FILTER_LABEL

    return _ivf_oracle(extra_where=f"AND v.label = {ANN_FILTER_LABEL}")


ORACLES: dict[str, str] = {
    # verbatim the from-scratch IVF oracles: the index is a layout,
    # not a semantics change — both paths must hash identically
    "ann_index_probe": _ivf_oracle(),
    "ann_index_filtered_probe": _filtered_oracle(),
}
