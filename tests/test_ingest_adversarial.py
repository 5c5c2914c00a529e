"""Adversarial ingest golden tests (VERDICT r2 item 6): the fixture
cases the executed-binary diff would have exercised — modest negative
years, surrogate-pair (astral-plane) text, out-of-range longitudes,
extreme quantity bounds — pinned against the documented semantics
(value.rs:243-284 pass-through doubles; the engine's ±infinity time
sentinels, FIXTURES.md)."""

from __future__ import annotations

import pytest

from wd2duckdb_spark.ingest import INFINITY_TS, NEG_INFINITY_TS

FIXTURE = "/root/repo/tests/fixtures/adversarial_dump.json"


@pytest.fixture(scope="module")
def adv_tables(spark, tmp_path_factory):
    from wd2duckdb_spark.ingest import ingest
    from wd2duckdb_spark.views import register_views

    out = str(tmp_path_factory.mktemp("adv")) + "/kg"
    ingest(spark, FIXTURE, out)
    return register_views(spark, out)


def test_negative_year_clamps_to_neg_infinity_sentinel(adv_tables):
    """-0044 (a modest, historically plausible negative year — not just
    the -4.5e9 geology case) → the engine's -infinity sentinel.

    Formatted JVM-side: CPython's naive datetime.fromtimestamp cannot
    represent year 1 (its pre-epoch fallback hits year 0), so a raw
    collect() of the sentinel raises in pyspark's TimestampType —
    Spark-side processing (filters, joins, exports) is unaffected."""
    from pyspark.sql import functions as F

    rows = (
        adv_tables["time"]
        .filter("src_id = 90001")
        .select(F.date_format("time", "yyyy-MM-dd HH:mm:ss").alias("t"))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["t"] == NEG_INFINITY_TS


def test_far_future_year_with_zero_day_clamps_to_infinity(adv_tables):
    """Year 2.5e9 with a low-precision '00' day → +infinity sentinel
    (the year test must win before any month/day normalization)."""
    from pyspark.sql import functions as F

    rows = (
        adv_tables["time"]
        .filter("src_id = 90002")
        .select(F.date_format("time", "yyyy-MM-dd HH:mm:ss").alias("t"))
        .collect()
    )
    assert len(rows) == 1
    assert rows[0]["t"] == INFINITY_TS


def test_out_of_range_coordinates_pass_through_raw(adv_tables):
    """longitude 270.25 / latitude -91.5: the reference stores the raw
    f64s (value.rs:243-256 — no wrap, no clamp), so must we."""
    r = adv_tables["coordinates"].filter("src_id = 90001").collect()[0]
    assert (r["latitude"], r["longitude"]) == (-91.5, 270.25)
    assert r["globe_id"] == 111


def test_extreme_quantity_bounds_survive_as_doubles(adv_tables):
    """±DBL_MAX bounds and a 30-digit decimal amount: both engines
    parse amounts as f64 (value.rs:257-270), so the stored values are
    exactly python float(s) of the same strings."""
    q = {r["src_id"]: r for r in adv_tables["quantity"].collect()}
    assert q[90001]["lower_bound"] == -1.7976931348623157e308
    assert q[90001]["upper_bound"] == 1.7976931348623157e308
    assert q[90001]["unit_id"] == 11574
    assert q[90002]["amount"] == float("123456789012345678901234567890.123")
    assert q[90002]["unit_id"] is None  # unit "1" → NULL


def test_surrogate_pair_text_is_byte_exact(adv_tables):
    """Astral-plane characters (UTF-16 surrogate pairs in the JVM)
    through label, description and monolingualtext — no mangling,
    no replacement chars."""
    v = adv_tables["vertex"].filter("id = 90002").collect()[0]
    assert v["label"] == "𝔘𝔫𝔦𝔠𝔬𝔡𝔢 🚀"
    # the fixture's é is the DECOMPOSED form (e + U+0301): pass-through
    # must preserve the combining sequence, not normalize it
    assert v["description"] == "astral 😀 e\u0301"
    s = adv_tables["string"].filter("src_id = 90002").collect()[0]
    assert s["string"] == "emoji 😀𝒳 pair"
