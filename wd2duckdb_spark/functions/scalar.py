"""Scalar function parity queries: string, date/time, math, JSON,
array/map, and the id-codec bridge (SURVEY §2.3 function rows; ingest
usage sites at main.rs:104-119, id.rs:28-59, value.rs:273).

All pure ``Column`` expressions — zero UDFs, fully inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wd2duckdb_spark.catalog import scan_partitions, spread, tbl
from wd2duckdb_spark.ids import encode_id_col


def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trim/upper/substring/length/concat/like — the sanitizer family
    (main.rs:104-119 uses trim/prefix/truncate)."""
    p = tbl(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 5).alias("type_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
    ).orderBy("p_partkey")


def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture groups + translate/lpad/reverse — the id-parsing
    family (the reference's Id::from parses 'Q42'/'F12-F3' by prefix
    and split, id.rs:28-59; regex capture is the general form)."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_brand", r"#(\d+)", 1).alias("brand_no"),
        F.regexp_extract("p_type", r"^(\w+) (\w+)", 2).alias("type_mid"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_caps_vowels"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.reverse("p_brand").alias("brand_rev"),
    ).orderBy("p_partkey")


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/date_trunc/datediff (value.rs:273 uses year())."""
    o = tbl(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_epoch_start"),
    ).orderBy("o_orderkey")


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """abs/floor/ceil/sqrt/ln/pmod — the id-arithmetic family
    (id.rs:70-88 uses offset add + wrapping mod).

    No ORDER BY: this emits the full fact table, and a global range
    sort of a row-per-row projection is presentation-only waste
    (measured 2.1 s → 0.7 s at sf0.1; the oracle compare is
    order-insensitive — same rationale as fuzzy_name_pairs)."""
    l = tbl(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("abs_disc_delta"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.pmod("l_orderkey", F.lit(7)).alias("key_mod7"),
    )


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events.props payload column —
    the from_json path of the ingest (main.rs:124-132)."""
    e = tbl(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 4).alias("avg_k"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split/size/distinct/element_at — the multilingual-list family
    (value.rs:394-401, main.rs:192-193)."""
    d = tbl(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"),
        F.element_at(words, 1).alias("first_token"),
        F.element_at(words, -1).alias("last_token"),
    ).orderBy("doc_id")


def q_explode_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (the claims fan-out primitive, main.rs:200-212) +
    frequency agg + deterministic top-20."""
    d = tbl(spark, sf_dir, "documents")
    return (
        # round-robin repartition: the corpus is one input split, and
        # the tokenize+explode work must spread across cores (AQE's
        # bytes-based view of the pre-explosion input says "tiny");
        # skipped when the scan is already multi-split (catalog.spread)
        spread(d, scan_parts=scan_partitions(spark, sf_dir, "documents"))
        .select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(20)
    )


def q_id_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The u32 keyspace codec as a bulk Column expression (id.rs:70-88),
    driven over testdata keys — Q/P/L offsets + wrapped F/S ids."""
    n = tbl(spark, sf_dir, "nation")
    k = F.col("n_nationkey").cast("long")
    return n.select(
        "n_nationkey",
        encode_id_col(F.concat(F.lit("Q"), k)).alias("qid"),
        encode_id_col(F.concat(F.lit("P"), k)).alias("pid"),
        encode_id_col(F.concat(F.lit("L"), k)).alias("lid"),
        encode_id_col(
            F.concat(F.lit("F"), k, F.lit("-F"), (k + 1))
        ).alias("fid"),
        encode_id_col(
            F.concat(F.lit("S"), k, F.lit("-S"), (k + 2))
        ).alias("sid"),
    ).orderBy("n_nationkey")


def q_variant_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse once into the
    binary variant encoding, then typed path extraction — the
    schema-on-read pattern for ragged JSON columns at scale (shredded
    access beats per-query string re-parsing)."""
    e = tbl(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        e.select(
            "event_id",
            F.variant_get(v, "$.k", "int").alias("k_val"),
            (F.variant_get(v, "$.k", "int") % 10).alias("k_bucket"),
        )
        .orderBy("event_id")
    )


def q_explode_outer_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer — flatten that PRESERVES rows whose array is
    empty (a NULL element row), so downstream accounting never loses
    documents; plain explode silently drops them."""
    d = tbl(spark, sf_dir, "documents")
    qwords = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t.startswith("q")
    )
    return d.select("doc_id", F.explode_outer(qwords).alias("qword")).orderBy(
        "doc_id", "qword"
    )


def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe cast/arithmetic family (try_cast / try_divide) — the
    dirty-data path. Spark 4 runs ANSI mode, where a bad cast or /0 in
    a 100 TB job kills the job at row 3 billion; try_* degrades to NULL
    row-locally instead (= DuckDB's TRY_CAST and NULL-on-/0
    semantics), keeping the quarantine decision in the pipeline."""
    p = tbl(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("try_cast(p_name AS INT)").alias("name_as_int"),
        F.expr(
            "try_cast(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)"
        ).alias("brand_num"),
        F.round(
            F.try_divide("p_retailprice", F.col("p_size") - F.col("p_size")), 2
        ).alias("div_zero"),
        # floor-truncation, not round: a quotient can land within an
        # ulp of a half-cent, where Spark (decimal-string HALF_UP) and
        # DuckDB (binary round) disagree; floor(x*100)/100 is pure
        # binary arithmetic and bit-identical across engines.
        (F.floor(F.try_divide("p_retailprice", "p_size") * 100) / 100).alias(
            "price_per_size"
        ),
    ).orderBy("p_partkey")


def q_posexplode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — explode WITH ORDINALITY: token position survives
    the flatten (needed for positional n-grams / rolling hashes where
    plain explode loses order). Narrow per-row fan-out, no shuffle
    before the (tiny-key) aggregation."""
    d = tbl(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return (
        d.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "word"),
        )
        .filter(F.col("word") != "")
        .select("doc_id", "pos", "word")
        .orderBy("doc_id", "pos")
    )


ORACLES: dict[str, str] = {
    "variant_funcs": """
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
               CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket
        FROM events
        ORDER BY event_id
    """,
    "explode_outer_words": """
        WITH d AS (
            SELECT doc_id,
                   list_filter(string_split(lower(text), ' '),
                               t -> t LIKE 'q%') AS arr
            FROM documents
        )
        SELECT d.doc_id, u.qword
        FROM d LEFT JOIN (SELECT doc_id, unnest(arr) AS qword FROM d) u
               USING (doc_id)
        ORDER BY doc_id, qword
    """,
    "try_funcs": """
        SELECT p_partkey,
               TRY_CAST(p_name AS INT) AS name_as_int,
               TRY_CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT)
                   AS brand_num,
               round(p_retailprice / (p_size - p_size), 2) AS div_zero,
               floor(p_retailprice / p_size * 100) / 100 AS price_per_size
        FROM part
        ORDER BY p_partkey
    """,
    "posexplode_ordinality": """
        SELECT doc_id, pos, word FROM (
            SELECT doc_id,
                   CAST(generate_subscripts(str_split(lower(text), ' '), 1) - 1
                        AS INT) AS pos,
                   unnest(str_split(lower(text), ' ')) AS word
            FROM documents
            WHERE doc_id < 50
        ) WHERE word <> ''
        ORDER BY doc_id, pos
    """,
    "string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               substr(p_type, 1, 5) AS type_prefix,
               CAST(length(p_name) AS INT) AS name_len,
               concat_ws('#', p_brand, p_type) AS brand_type,
               regexp_replace(p_name, '[aeiou]', '_', 'g') AS name_devoweled
        FROM part
        WHERE p_name LIKE '%a%'
        ORDER BY p_partkey
    """,
    "regexp_funcs": r"""
        SELECT p_partkey,
               regexp_extract(p_brand, '#(\d+)', 1) AS brand_no,
               regexp_extract(p_type, '^(\w+) (\w+)', 2) AS type_mid,
               translate(p_name, 'aeiou', 'AEIOU') AS name_caps_vowels,
               lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
               reverse(p_brand) AS brand_rev
        FROM part
        ORDER BY p_partkey
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(month(o_orderdate) AS INT) AS mo,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
               CAST(date_diff('day', DATE '1995-01-01',
                              CAST(o_orderdate AS DATE)) AS INT)
                   AS days_since_epoch_start
        FROM orders
        ORDER BY o_orderkey
    """,
    "math_funcs": """
        SELECT l_orderkey, l_linenumber,
               round(abs(l_discount - 0.05), 4) AS abs_disc_delta,
               CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
               CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
               round(sqrt(l_extendedprice), 6) AS price_sqrt,
               round(ln(l_extendedprice), 6) AS price_ln,
               l_orderkey % 7 AS key_mod7
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber
    """,
    "json_funcs": """
        SELECT event_type,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT)
                   AS sum_k,
               round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4)
                   AS avg_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "array_funcs": """
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
               CAST(len(list_distinct(string_split(text, ' '))) AS INT)
                   AS n_distinct,
               string_split(text, ' ')[1] AS first_token,
               string_split(text, ' ')[-1] AS last_token
        FROM documents
        ORDER BY doc_id
    """,
    "explode_words": """
        SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents
        ) WHERE word <> ''
        GROUP BY word
        ORDER BY freq DESC, word
        LIMIT 20
    """,
    "id_codec": """
        SELECT n_nationkey,
               CAST(n_nationkey AS BIGINT) AS qid,
               CAST(n_nationkey + 1000000000 AS BIGINT) AS pid,
               CAST(n_nationkey + 2000000000 AS BIGINT) AS lid,
               CAST((n_nationkey + (n_nationkey + 1) + 5000000000) % 4294967296
                    AS BIGINT) AS fid,
               CAST((n_nationkey + (n_nationkey + 2) + 5500000000) % 4294967296
                    AS BIGINT) AS sid
        FROM nation
        ORDER BY n_nationkey
    """,
}

QUERIES = {
    "string_funcs": q_string_funcs,
    "regexp_funcs": q_regexp_funcs,
    "datetime_funcs": q_datetime_funcs,
    "math_funcs": q_math_funcs,
    "json_funcs": q_json_funcs,
    "array_funcs": q_array_funcs,
    "explode_words": q_explode_words,
    "id_codec": q_id_codec,
    "posexplode_ordinality": q_posexplode_ordinality,
    "try_funcs": q_try_funcs,
    "variant_funcs": q_variant_funcs,
    "explode_outer_words": q_explode_outer_words,
}
