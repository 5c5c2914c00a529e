"""Id codec tests: exact reproduction of wikidata-rs/src/id.rs.

Property tests pin the scalar codec to the reference formulas; a
column-vs-scalar parity test pins the Catalyst expression to the
scalar codec.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wd2duckdb_spark.ids import (
    DTYPE_CODES,
    DTYPE_TABLE,
    U32,
    decode_id,
    dtype_node_id,
    encode_id,
    encode_id_col,
)

# Reference-derived golden values (id.rs:70-88; FIXTURES.md §1 table).
GOLDEN = {
    "Q42": 42,
    "P31": 1_000_000_031,
    "L1": 2_000_000_001,
    "F1-F1": 705_032_706,  # (1 + 1 + 5e9) mod 2^32 (FIXTURES.md L1 row)
    "S12-S4": (12 + 4 + 5_500_000_000) % U32,
    "@Quantity": 4_000_000_001,
    "@Coordinate": 4_000_000_002,
    "@String": 4_000_000_003,
    "@DateTime": 4_000_000_004,
    "@Entity": 4_000_000_005,
}


@pytest.mark.parametrize("s,expected", GOLDEN.items())
def test_golden(s, expected):
    assert encode_id(s) == expected


def test_dtype_tables():
    # dtype.rs:28-38
    assert DTYPE_TABLE == {
        "Quantity": "quantity",
        "Coordinate": "coordinates",
        "String": "string",
        "DateTime": "time",
        "Entity": "edge",
    }
    assert DTYPE_CODES["Entity"] == 5
    assert dtype_node_id("Quantity") == 4_000_000_001


@given(st.integers(0, 999_999_999))
def test_qid_identity(n):
    assert encode_id(f"Q{n}") == n
    assert decode_id(n) == f"Q{n}"


@given(st.integers(0, 999_999_999))
def test_pid_offset(n):
    v = encode_id(f"P{n}")
    assert v == n + 1_000_000_000
    assert decode_id(v) == f"P{n}"


@given(st.integers(0, 999_999_999), st.integers(0, 65_535))
def test_fid_sid_wrapping(lid, idx):
    # id.rs:73-84 — wrapping u32 arithmetic
    fid = encode_id(f"F{lid}-F{idx}")
    sid = encode_id(f"S{lid}-S{idx}")
    assert fid == (lid + 2_000_000_000 + idx + 3_000_000_000) % U32
    assert sid == (lid + 2_000_000_000 + idx + 3_000_000_000 + 500_000_000) % U32
    assert 0 <= fid < U32 and 0 <= sid < U32


def test_invalid_raises():
    with pytest.raises(ValueError):
        encode_id("X1")


@settings(deadline=None, max_examples=20)
@given(
    st.lists(
        st.one_of(
            st.integers(0, 10**9).map(lambda n: f"Q{n}"),
            st.integers(0, 10**7).map(lambda n: f"P{n}"),
            st.integers(0, 10**6).map(lambda n: f"L{n}"),
            st.tuples(st.integers(0, 10**6), st.integers(0, 100)).map(
                lambda t: f"F{t[0]}-F{t[1]}"
            ),
            st.tuples(st.integers(0, 10**6), st.integers(0, 100)).map(
                lambda t: f"S{t[0]}-S{t[1]}"
            ),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_column_codec_matches_scalar(spark, ids):
    """The Catalyst expression and the Python scalar codec agree."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(s,) for s in ids], ["wid"])
    got = [r["enc"] for r in df.select(encode_id_col(F.col("wid")).alias("enc")).collect()]
    assert got == [encode_id(s) for s in ids]
