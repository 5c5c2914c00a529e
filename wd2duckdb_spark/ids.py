"""Single-u32-keyspace id codec (reference: wikidata-rs/src/id.rs).

Every Wikidata identifier folds into one unsigned-32-bit keyspace
(id.rs:70-88):

=========  =======================================================  ==========
kind       formula                                                  id.rs
=========  =======================================================  ==========
Qid        ``qid``                                                  :78
Pid        ``pid + 1_000_000_000``                                  :77
Lid        ``lid + 2_000_000_000``                                  :76
Fid        ``(lid + 2e9 + form_idx + 3e9) mod 2^32``                :73-75
Sid        ``(lid + 2e9 + sense_idx + 3e9 + 5e8) mod 2^32``         :79-84
DataType   ``u8 code (1..5) + 4_000_000_000``                       :85
=========  =======================================================  ==========

String forms parsed (id.rs:28-59): ``Q42 P31 L99 F12-F3 S12-S4`` and the
virtual type nodes ``@Quantity @Coordinate @String @DateTime @Entity``
(codes 1-5, dtype.rs:58-68).

Spark has no unsigned 32-bit integer, so ids are ``LongType`` and the
wrapping Fid/Sid arithmetic is reproduced with ``pmod(x, 2^32)`` — known
hazard (documented, not fixed, per the reference): wrapped Fid/Sid values
can collide with the Qid/Pid ranges.

Two APIs per direction:

- Python scalars (``encode_id("Q42") -> 42``) for literals in filters —
  the common query-side path, zero runtime cost.
- Column expressions (``encode_id_col(col)``) for encoding whole columns
  during ingest — pure Catalyst exprs, no UDFs, whole-stage-codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

U32 = 2**32
PID_OFFSET = 1_000_000_000
LID_OFFSET = 2_000_000_000
FS_OFFSET = 3_000_000_000
SID_EXTRA = 500_000_000
DTYPE_OFFSET = 4_000_000_000

#: dtype.rs:58-68 — u8 code per virtual data-type node.
DTYPE_CODES = {
    "Quantity": 1,
    "Coordinate": 2,
    "String": 3,
    "DateTime": 4,
    "Entity": 5,
}

#: dtype.rs:28-38 — physical table each data type routes to.
DTYPE_TABLE = {
    "Quantity": "quantity",
    "Coordinate": "coordinates",
    "String": "string",
    "DateTime": "time",
    "Entity": "edge",
}


def dtype_code(name: str) -> int:
    """u8 discriminator code for a data-type name (dtype.rs:58-68)."""
    return DTYPE_CODES[name]


def dtype_node_id(name: str) -> int:
    """Virtual type-node vertex id: code + 4e9 (id.rs:85)."""
    return DTYPE_CODES[name] + DTYPE_OFFSET


# ---------------------------------------------------------------------------
# Python-scalar codec (query-side literals)
# ---------------------------------------------------------------------------


def encode_id(s: str) -> int:
    """``"Q42" | "P31" | "L9" | "F12-F3" | "S12-S4" | "@String"`` → int.

    Exact reproduction of id.rs:28-59 (parse) + id.rs:70-88 (u32 fold),
    including the mod-2^32 wrap for forms and senses.
    """
    kind = s[0]
    if kind == "Q":
        return int(s[1:])
    if kind == "P":
        return int(s[1:]) + PID_OFFSET
    if kind == "L":
        return int(s[1:]) + LID_OFFSET
    if kind == "F":
        lid_s, idx_s = s[1:].split("-", 1)
        return (int(lid_s) + LID_OFFSET + int(idx_s[1:]) + FS_OFFSET) % U32
    if kind == "S":
        lid_s, idx_s = s[1:].split("-", 1)
        return (int(lid_s) + LID_OFFSET + int(idx_s[1:]) + FS_OFFSET + SID_EXTRA) % U32
    if kind == "@":
        return dtype_node_id(s[1:])
    raise ValueError(f"Not valid value: {s}")


def decode_id(v: int) -> str:
    """Best-effort inverse of :func:`encode_id` by keyspace range.

    The wrapped Fid/Sid ranges overlap Qid/Pid (reference hazard, SURVEY
    §1.3), so values landing there decode to the Q/P reading.
    """
    if DTYPE_OFFSET < v <= DTYPE_OFFSET + 5:
        name = {c: n for n, c in DTYPE_CODES.items()}[v - DTYPE_OFFSET]
        return f"@{name}"
    if v >= LID_OFFSET:
        return f"L{v - LID_OFFSET}"
    if v >= PID_OFFSET:
        return f"P{v - PID_OFFSET}"
    return f"Q{v}"


# ---------------------------------------------------------------------------
# Column-expression codec (ingest-side, bulk)
# ---------------------------------------------------------------------------


def _num(c: Column, strip: int = 1) -> Column:
    return F.substring(c, strip + 1, 32).cast("long")


def encode_id_col(c: Column) -> Column:
    """Column version of :func:`encode_id` — pure Catalyst expression.

    Handles Q/P/L ids and the dash forms F<lid>-F<idx> / S<lid>-S<idx>;
    non-matching strings → NULL (the ingest routes those claims away
    before encoding). Stays entirely in whole-stage codegen: substring /
    split / cast / pmod — no Python.
    """
    kind = F.substring(c, 1, 1)
    lid_part = F.split(F.substring(c, 2, 64), "-").getItem(0).cast("long")
    idx_part = F.substring(F.split(F.substring(c, 2, 64), "-").getItem(1), 2, 32).cast(
        "long"
    )
    return (
        F.when(kind == "Q", _num(c))
        .when(kind == "P", _num(c) + F.lit(PID_OFFSET))
        .when(kind == "L", _num(c) + F.lit(LID_OFFSET))
        .when(
            kind == "F",
            F.pmod(lid_part + F.lit(LID_OFFSET + FS_OFFSET) + idx_part, F.lit(U32)),
        )
        .when(
            kind == "S",
            F.pmod(
                lid_part + F.lit(LID_OFFSET + FS_OFFSET + SID_EXTRA) + idx_part,
                F.lit(U32),
            ),
        )
        .otherwise(F.lit(None).cast("long"))
    )


def encode_qid_col(c: Column) -> Column:
    """Encode a column of bare numeric Qids (already ints) — identity."""
    return c.cast("long")


def decode_id_col(c: Column) -> Column:
    """Column inverse: long id → canonical string form (range-based)."""
    return (
        F.when(
            (c > DTYPE_OFFSET) & (c <= DTYPE_OFFSET + 5),
            F.concat(
                F.lit("@"),
                F.element_at(
                    F.map_from_arrays(
                        F.array(*[F.lit(v) for v in DTYPE_CODES.values()]),
                        F.array(*[F.lit(k) for k in DTYPE_CODES.keys()]),
                    ),
                    (c - DTYPE_OFFSET).cast("int"),
                ),
            ),
        )
        .when(c >= LID_OFFSET, F.concat(F.lit("L"), (c - LID_OFFSET).cast("string")))
        .when(c >= PID_OFFSET, F.concat(F.lit("P"), (c - PID_OFFSET).cast("string")))
        .otherwise(F.concat(F.lit("Q"), c.cast("string")))
    )
