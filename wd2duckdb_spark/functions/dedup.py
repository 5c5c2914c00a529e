"""Deduplication operators (north-star extensions, BASELINE.json):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Design for 100 TB:

- exact dedup: hash-groupBy on the normalized-content key — one shuffle
  on a uniformly-distributed md5 key, no skew;
- MinHash/LSH: shingle → k minhashes → band keys → bucket self-join.
  The self-join is on band keys, never all-pairs; candidate volume is
  controlled by (k, bands) — the classic banding trade-off;
- SimHash: one pass to a 16-bit signature per doc (pure agg), pairs
  compared only within signature buckets at scale;
- n-gram Jaccard: exact verification step for candidate pairs (here
  demonstrated on the deterministic consecutive-id pairing);
- embedding near-dup: banded sign-LSH candidate buckets (one shuffle,
  in-bucket pair expansion, inline cosine verify) — never all-pairs;
  miss probability is parameterized by the banding S-curve.

All hashes are md5-derived so every operator is reproducible in ANSI
SQL — the DuckDB oracles verify signatures, not just row counts. No
UDFs anywhere: shingling uses higher-order array functions, hashing
uses md5+conv, all inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import tbl

N_MINHASH = 8  #: hash functions in the MinHash signature
N_BANDS = 4  #: LSH bands (rows per band = N_MINHASH // N_BANDS = 2)


def word_shingles_expr(n: int = 3) -> str:
    """SQL expression producing distinct word n-gram shingles of `text`
    (shared shape between the Spark plan and the DuckDB oracle)."""
    gram = " || ' ' || ".join(f"tk[i + {j}]" for j in range(n))
    return (
        "list_distinct(list_transform(range(1, len(tk) - 1), "
        f"i -> {gram}))".replace("tk", "string_split(lower(trim(text)), ' ')")
    )


def _minhash_cols() -> list[Column]:
    """k md5-derived minhash aggregates over the exploded shingle col.

    One md5 yields four independent 32-bit values (128/32), so the 8
    hash functions cost 2 md5 evaluations per shingle, not 8.
    """
    return [
        F.min(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i // 4}|"), F.col("shingle"))),
                    1 + 8 * (i % 4),
                    8,
                ),
                16,
                10,
            ).cast("long")
        ).alias(f"h{i}")
        for i in range(N_MINHASH)
    ]


def _with_shingles(d: DataFrame) -> DataFrame:
    """documents → (doc_id, sh: array<string>) distinct word-3-grams.

    Tokenizes ONCE into a materialized ``toks`` column before the
    sliding-window transform — evaluating ``split()`` inside the lambda
    would re-split the text per window element (O(tokens²) per doc).

    Repartitions on doc_id first: the fixture table is one small
    parquet file (one input split), and the higher-order-function
    shingling is interpreted (non-codegen) — without the repartition
    the whole corpus shingles on a single core. On a real multi-split
    corpus the scan parallelizes anyway, and hash-partitioning by
    doc_id pre-aligns the downstream groupBy(doc_id) so the minhash
    aggregation needs no second exchange.

    The partition count is explicit: a bare ``repartition("doc_id")``
    exchange gets AQE-coalesced back to ONE partition (input bytes are
    tiny pre-explosion), silently re-serializing the shingle work.
    Cost is per-shingle CPU, not input bytes, so bytes-based coalescing
    is the wrong heuristic here.
    """
    return (
        d.repartition(d.sparkSession.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("toks")
        )
        .filter(F.size("toks") >= 3)
        .select(
            "doc_id",
            F.expr(
                "array_distinct(transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', element_at(toks, i),"
                " element_at(toks, i + 1), element_at(toks, i + 2))))"
            ).alias("sh"),
        )
    )


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, shingle) exploded word-3-grams.

    NOT deduplicated per doc: the only consumer is the MinHash min()
    aggregation, which is invariant to duplicate shingles, so the
    per-doc ``array_distinct`` pass (interpreted, O(n·k)) is pure
    cost here. The DuckDB oracle keeps ``list_distinct`` and matches
    bit-for-bit. Jaccard (set semantics) uses ``_with_shingles``,
    which stays distinct.

    The generator expression is inlined into ``explode`` rather than
    projected first: with a separate projection, Catalyst infers a
    ``size(sh) > 0 AND isnotnull(sh)`` filter from the Generate and
    pushes the WHOLE shingle expression (re-expanded, evaluated twice)
    below the exchange — a 15x slowdown observed at sf0.1. Inline, the
    Generate evaluates it once per input row.
    """
    d = tbl(spark, sf_dir, "documents")
    toks = (
        # explicit count: see _with_shingles — AQE would coalesce a
        # bare key-repartition to 1 task and single-thread the md5s
        d.repartition(spark.sparkContext.defaultParallelism, "doc_id")
        .select(
            "doc_id", F.split(F.lower(F.trim(F.col("text"))), " ").alias("toks")
        )
        .filter(F.size("toks") >= 3)
    )
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(toks) - 2),"
                " i -> concat_ws(' ', element_at(toks, i),"
                " element_at(toks, i + 1), element_at(toks, i + 2)))"
            )
        ).alias("shingle"),
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature (h0..h7) — one shuffle (groupBy doc_id)."""
    return _shingled(spark, sf_dir).groupBy("doc_id").agg(*_minhash_cols())


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(spark, sf_dir).orderBy("doc_id")


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: docs sharing any of the 4 band keys
    (band = md5 of 2 adjacent signature values). The join is on band
    keys — the production-scale path (never all-pairs).

    Implementation: bands → groupBy(band, key) collecting the (small)
    bucket membership → in-bucket pair expansion with a nested
    transform. One shuffle, signature pipeline computed exactly once —
    no self-join, no cache. Bucket sizes are bounded by the LSH banding
    parameters (pathological all-identical corpora excepted, which is
    inherent to the operator)."""
    sig = minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.md5(
                            F.concat_ws(
                                ",", F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")
                            )
                        ).alias("key"),
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair = F.explode(
        F.expr(
            "flatten(transform(ids, (x, i) ->"
            " transform(slice(ids, i + 2, size(ids)),"
            " y -> struct(x AS a_id, y AS b_id))))"
        )
    )
    return (
        buckets.select(pair.alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
        .orderBy("a_id", "b_id")
    )


def connected_components(pairs: DataFrame, max_iters: int = 50) -> DataFrame:
    """Undirected connected components over ``(a_id, b_id)`` pairs by
    iterative min-label propagation: every node repeatedly adopts the
    minimum label among itself and its neighbors until fixpoint.

    Returns ``(node, cluster_id)`` where cluster_id = the component's
    minimum node id. Converges in O(component diameter) rounds (early
    exit on no-change); each round is one join + one aggregation, both
    on the node key — the standard distributed-CC shape (the
    large-star/small-star family reduces rounds to ~log n at extreme
    diameters; LSH dedup components are shallow, so plain propagation
    is the right cost here).

    Every round's labels are ``localCheckpoint``-ed (eager): iterative
    plans grow per round, and without lineage truncation the driver
    OOMs on plan analysis after ~12 rounds. Local (not reliable)
    checkpointing trades executor-loss recomputability for zero
    external storage — acceptable for a deterministic re-runnable
    batch job; swap in ``spark.sparkContext.setCheckpointDir`` +
    ``.checkpoint()`` on clusters where executor loss is routine.

    Raises ``RuntimeError`` if still unconverged after ``max_iters`` —
    silently returning partial labels would split real components.
    """
    edges = (
        pairs.selectExpr("a_id AS u", "b_id AS v")
        .union(pairs.selectExpr("b_id AS u", "a_id AS v"))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("cluster_id", F.col("node"))
        .localCheckpoint(eager=True)
    )
    try:
        for _ in range(max_iters):
            neighbor_min = (
                edges.join(labels, edges["v"] == labels["node"])
                .groupBy(edges["u"].alias("node"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        "cluster_id", F.coalesce("nbr_min", "cluster_id")
                    ).alias("cluster_id"),
                )
                .localCheckpoint(eager=True)  # truncate lineage per round
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
                .limit(1)
                .count()
            )
            labels.unpersist()
            labels = new_labels
            if changed == 0:
                return labels
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters or "
            "switch to a large-star/small-star variant"
        )
    finally:
        edges.unpersist()


#: (session id, sf_dir) → component labels. connected_components is
#: iterative (eager jobs at build time, unlike every other lazy
#: queries() entry); memoizing bounds that cost — and the checkpoint
#: blocks it pins — to once per session+dataset across plan sweeps,
#: bench, and the driver contract.
_cc_cache: dict[tuple[int, str], DataFrame] = {}


def q_neardup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup KEEP-LIST — what a training-data pipeline actually
    consumes: every document with its near-dup cluster id (component
    of the MinHash-LSH candidate graph, canonical = min doc_id) and a
    keep flag. Docs in no candidate pair are their own singleton
    cluster and are kept.

    NOTE: unlike the other registered queries this runs eager Spark
    jobs at DataFrame-construction time (iterative CC cannot be
    expressed lazily); results are memoized per (session, sf_dir)."""
    key = (id(spark), sf_dir)
    cc = _cc_cache.get(key)
    if cc is None:
        pairs = q_minhash_lsh_pairs(spark, sf_dir).select("a_id", "b_id")
        _cc_cache[key] = cc = connected_components(pairs)
    d = tbl(spark, sf_dir, "documents").select("doc_id")
    out = (
        d.join(cc, d["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
    return out.orderBy("doc_id")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized content: keep min doc_id per content
    key, count copies. One shuffle on the uniform md5 key."""
    d = tbl(spark, sf_dir, "documents")
    key = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        d.groupBy(key.alias("content_key"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
        .orderBy("keep_id")
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc over distinct tokens: bit j of the
    signature = majority vote of bit j across token hashes."""
    d = tbl(spark, sf_dir, "documents")
    toks = d.repartition(
        # explicit count: see _with_shingles — the md5-per-token work
        # must spread over all cores, AQE would coalesce to 1 task
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.trim(F.col("text"))), " "))).alias(
            "tok"
        ),
    ).filter(F.col("tok") != "")
    h16 = F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int")
    bit_sums = [
        F.sum(F.shiftright(h16, j).bitwiseAND(1)).alias(f"c{j}") for j in range(16)
    ]
    agg = toks.groupBy("doc_id").agg(F.count("*").alias("n"), *bit_sums)
    sim = None
    for j in range(16):
        term = F.when(F.col(f"c{j}") * 2 > F.col("n"), F.lit(1 << j)).otherwise(0)
        sim = term if sim is None else sim + term
    return agg.select("doc_id", sim.cast("int").alias("simhash")).orderBy("doc_id")


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-3-gram Jaccard similarity — the verification operator
    for candidate pairs, demonstrated on consecutive-id pairs."""
    s = _with_shingles(tbl(spark, sf_dir, "documents")).cache()
    a = s.alias("a")
    b = s.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    return (
        a.join(b, F.col("a.doc_id") + 1 == F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.round(inter.cast("double") / union, 4).alias("jaccard"),
        )
        .orderBy("a_id")
    )


def q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ANY
    word-3-gram with a held-out benchmark set (here doc_id < 10) — the
    eval-leakage filter every training-data pipeline runs before a
    corpus ships.

    Scale shape: the benchmark gram set is small by construction
    (benchmarks are KBs-MBs, the corpus is the 100 TB side), so it
    broadcasts; the corpus side streams through a map-side left-semi
    probe and never shuffles. Dedup of flagged ids is a distinct on the
    (tiny) match output."""
    d = _with_shingles(tbl(spark, sf_dir, "documents"))
    bench = (
        d.filter(F.col("doc_id") < 10)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    corpus = d.filter(F.col("doc_id") >= 10).select(
        "doc_id", F.explode("sh").alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


#: Banded sign-LSH parameters for the embedding near-dup candidate
#: generator: EMB_LSH_TABLES independent hash tables, each keyed by the
#: sign bits of EMB_LSH_PLANES md5-derived hyperplanes.  With bit-
#: agreement probability s = 1 - theta/pi, a qualifying pair collides in
#: one table with probability s^planes, so the miss probability is
#: (1 - s^planes)^tables.  At the fixture threshold (cosine 0.4 =>
#: s = 0.631) the (2, 32) setting gives a 9e-8 per-pair miss — the
#: candidate set is exhaustive in practice, which is what lets the
#: exact all-pairs oracle stay the correctness gate.  At a production
#: near-dup threshold (cosine 0.95 => s = 0.9) the same operator with
#: (12, 16) prunes candidates ~500x; the parameters are the standard
#: banding S-curve trade-off, not a code change.
EMB_LSH_PLANES = 2
EMB_LSH_TABLES = 32


def _emb_lsh_bits_sql(n_bits: int) -> str:
    """SQL for the array of ``n_bits`` hyperplane sign bits of column v.

    Plane components are md5-derived exactly as
    ``similarity._plane_component`` (md5(f"{p}|{d}") first 8 hex digits
    / 0x7FFFFFFF - 1.0) so Python, Spark SQL and the DuckDB-side test
    harness can all reproduce the same planes with no RNG state and no
    giant literal arrays shipped through the parser.  At 100 TB the
    bits become a write-time stored column and this expression runs
    once per ingested row, never per query."""
    return (
        f"transform(sequence(0, {n_bits} - 1), p -> CASE WHEN aggregate("
        " sequence(1, size(v)), CAST(0 AS DOUBLE),"
        " (acc, d) -> acc + element_at(v, d) *"
        "  (CAST(conv(substring(md5(concat(CAST(p AS STRING), '|',"
        "   CAST(d - 1 AS STRING))), 1, 8), 16, 10) AS BIGINT)"
        "   / 2147483647.0 - 1.0)) >= 0 THEN 1 ELSE 0 END)"
    )


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above 0.4 (rounded).

    The fixture embeddings are near-orthogonal random vectors (max
    pairwise cosine ~0.6), so 0.4 is the threshold that exercises the
    operator non-degenerately; production near-dup would use ~0.95.

    Scale shape: banded sign-LSH candidate generation — every vector
    computes EMB_LSH_TABLES band signatures (EMB_LSH_PLANES sign bits
    each), buckets form via ONE groupBy shuffle on (table, signature),
    and pairs expand in-bucket with the cosine verified inline (same
    nested-transform trick as q_minhash_lsh_pairs).  No self-join, no
    BroadcastNestedLoopJoin, no driver collect — the plan is a scan +
    one hash exchange + generate, which partitions horizontally at any
    corpus size.  Bucket population is bounded by the banding
    parameters (see EMB_LSH_PLANES); identical-vector pathologies are
    the operator's inherent worst case and get the same salting answer
    as any skewed key.  The cosine arithmetic is the identical
    zip_with/aggregate fold the all-pairs formulation used, so results
    hash-match the exact DuckDB oracle."""
    e = tbl(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    )
    n_bits = EMB_LSH_TABLES * EMB_LSH_PLANES
    bands_sql = (
        f"transform(sequence(0, {EMB_LSH_TABLES} - 1), t -> struct(t AS tbl,"
        " element_at(bits, 2 * t + 1) * 2 + element_at(bits, 2 * t + 2) AS sig))"
    )
    buckets = (
        e.withColumn("bits", F.expr(_emb_lsh_bits_sql(n_bits)))
        .select("vec_id", "v", F.explode(F.expr(bands_sql)).alias("b"))
        .groupBy(F.col("b.tbl").alias("tbl"), F.col("b.sig").alias("sig"))
        .agg(F.sort_array(F.collect_list(F.struct("vec_id", "v"))).alias("m"))
        .filter(F.size("m") >= 2)
    )
    pair_sql = """
        flatten(transform(m, (x, i) -> transform(slice(m, i + 2, size(m)),
          y -> struct(x.vec_id AS a_id, y.vec_id AS b_id,
            round(
              aggregate(zip_with(x.v, y.v, (p, q) -> p * q),
                        CAST(0 AS DOUBLE), (acc, z) -> acc + z)
              / (sqrt(aggregate(transform(x.v, z -> z * z),
                                CAST(0 AS DOUBLE), (acc, z) -> acc + z))
               * sqrt(aggregate(transform(y.v, z -> z * z),
                                CAST(0 AS DOUBLE), (acc, z) -> acc + z))),
              4) AS cosine))))
    """
    return (
        buckets.select(F.explode(F.expr(pair_sql)).alias("p"))
        .select("p.a_id", "p.b_id", "p.cosine")
        .filter(F.col("cosine") > 0.4)
        .distinct()
        .orderBy("a_id", "b_id")
    )


def _minhash_sql_cte() -> str:
    """Shared oracle CTE: doc_id → h0..h7 minhash signature."""
    hashes = ", ".join(
        f"min(('0x' || substr(md5('{i // 4}|' || shingle), {1 + 8 * (i % 4)}, 8))"
        f"::BIGINT) AS h{i}"
        for i in range(N_MINHASH)
    )
    return f"""
        shingled AS (
            SELECT doc_id, unnest({word_shingles_expr(3)}) AS shingle
            FROM documents
            WHERE len(string_split(lower(trim(text)), ' ')) >= 3
        ),
        sig AS (SELECT doc_id, {hashes} FROM shingled GROUP BY doc_id)
    """




def q_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-duplicate detection with blocking: part names
    sharing their noun (last word) pair up only inside that block, then
    `levenshtein` ≤ 4 keeps close adjectives. The block key bounds the
    quadratic term — pairs per block, not per table; at 100 TB widen
    the key (noun + length band / soundex) until blocks fit a task.
    JVM built-in levenshtein, no UDF; the equi-join on the block key
    is an ordinary shuffle hash join."""
    p = tbl(spark, sf_dir, "part").select("p_partkey", "p_name")
    noun = F.element_at(F.split("p_name", " "), -1)
    a = p.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_name").alias("a_name"),
        noun.alias("block"),
    )
    b = p.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_name").alias("b_name"),
        noun.alias("block"),
    )
    return (
        a.join(b, "block")
        .filter(F.col("a_key") < F.col("b_key"))
        .withColumn("lev_dist", F.levenshtein("a_name", "b_name"))
        .filter(F.col("lev_dist") <= 4)
        .select("a_key", "b_key", "a_name", "b_name", "lev_dist")
        .orderBy("a_key", "b_key")
    )


ORACLES: dict[str, str] = {
    "fuzzy_name_pairs": """
        WITH p AS (
            SELECT p_partkey, p_name,
                   string_split(p_name, ' ')[-1] AS block
            FROM part
        )
        SELECT a.p_partkey AS a_key, b.p_partkey AS b_key,
               a.p_name AS a_name, b.p_name AS b_name,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS lev_dist
        FROM p a JOIN p b ON a.block = b.block
                          AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 4
        ORDER BY a_key, b_key
    """,

    "minhash_signatures": f"""
        WITH {_minhash_sql_cte()}
        SELECT * FROM sig ORDER BY doc_id
    """,
    "minhash_lsh_pairs": f"""
        WITH {_minhash_sql_cte()},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band,"
                f" md5(CAST(h{2*b} AS VARCHAR) || ',' || CAST(h{2*b+1} AS VARCHAR))"
                f" AS key FROM sig"
                for b in range(N_BANDS)
            )}
        )
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ORDER BY a_id, b_id
    """,
    "neardup_keep_list": f"""
        WITH RECURSIVE
        {_minhash_sql_cte()},
        bands AS (
            {" UNION ALL ".join(
                f"SELECT doc_id, {b} AS band,"
                f" md5(CAST(h{2*b} AS VARCHAR) || ',' || CAST(h{2*b+1} AS VARCHAR))"
                f" AS key FROM sig"
                for b in range(N_BANDS)
            )}
        ),
        pairs AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        ),
        edges AS (
            SELECT a_id AS u, b_id AS v FROM pairs
            UNION SELECT b_id, a_id FROM pairs
        ),
        reach(node, r) AS (
            SELECT u, u FROM (SELECT u FROM edges)
            UNION
            SELECT e.u, re.r FROM edges e JOIN reach re ON re.node = e.v
        ),
        cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
        SELECT d.doc_id,
               coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
               d.doc_id = coalesce(cc.cluster_id, d.doc_id) AS keep
        FROM documents d LEFT JOIN cc ON d.doc_id = cc.node
        ORDER BY d.doc_id
    """,
    "dedup_exact": """
        SELECT md5(lower(trim(text))) AS content_key,
               min(doc_id) AS keep_id,
               CAST(count(*) AS BIGINT) AS n_copies
        FROM documents
        GROUP BY 1
        ORDER BY keep_id
    """,
    "simhash": f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_distinct(string_split(lower(trim(text)), ' ')))
                       AS tok
            FROM documents
        ),
        agg AS (
            SELECT doc_id, count(*) AS n,
                   {", ".join(
                       f"sum((('0x' || substr(md5(tok), 1, 4))::INT >> {j}) & 1)"
                       f" AS c{j}"
                       for j in range(16)
                   )}
            FROM toks WHERE tok <> '' GROUP BY doc_id
        )
        SELECT doc_id,
               CAST({" + ".join(
                   f"CASE WHEN c{j} * 2 > n THEN {1 << j} ELSE 0 END"
                   for j in range(16)
               )} AS INT) AS simhash
        FROM agg
        ORDER BY doc_id
    """,
    "ngram_jaccard": f"""
        WITH s AS (
            SELECT doc_id, {word_shingles_expr(3)} AS sh
            FROM documents
            WHERE len(string_split(lower(trim(text)), ' ')) >= 3
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(a.sh || b.sh)), 4) AS jaccard
        FROM s a JOIN s b ON a.doc_id + 1 = b.doc_id
        ORDER BY a_id
    """,
    "ngram_decontaminate": f"""
        WITH s AS (
            SELECT doc_id, {word_shingles_expr(3)} AS sh
            FROM documents
            WHERE len(string_split(lower(trim(text)), ' ')) >= 3
        ), bench AS (
            SELECT DISTINCT unnest(sh) AS gram FROM s WHERE doc_id < 10
        ), corpus AS (
            SELECT doc_id, unnest(sh) AS gram FROM s WHERE doc_id >= 10
        )
        SELECT DISTINCT doc_id
        FROM corpus JOIN bench USING (gram)
        ORDER BY doc_id
    """,
    "embedding_neardup": """
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                            CAST(b.embedding AS DOUBLE[])), 4)
                   AS cosine
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 4)
              > 0.4
        ORDER BY a_id, b_id
    """,
}

QUERIES = {
    "minhash_signatures": q_minhash_signatures,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "neardup_keep_list": q_neardup_keep_list,
    "dedup_exact": q_dedup_exact,
    "simhash": q_simhash,
    "ngram_jaccard": q_ngram_jaccard,
    "ngram_decontaminate": q_ngram_decontaminate,
    "embedding_neardup": q_embedding_neardup,
    "fuzzy_name_pairs": q_fuzzy_name_pairs,
}
