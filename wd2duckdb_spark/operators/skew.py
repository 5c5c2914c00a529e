"""Skew-mitigation operators (SURVEY §4.3).

Real Wikidata edges are pathologically skewed: hub keys like P31
("instance of") and Q5 ("human") dominate. Two tiers:

1. **AQE skew-join** — on by default in the engine session
   (session.py); splits oversized shuffle partitions at runtime. The
   first line of defense, zero code.
2. **Salted join** (this module) — for the cases AQE can't fix (e.g. a
   single key so hot one partition of it still exceeds memory, or
   broadcast infeasible on both sides). The hot side's key is
   decorated with a random-ish salt in [0, n); the other side is
   replicated n ways with an exploded salt column. Join key becomes
   (key, salt) → the hot key spreads over n partitions.

The salt is derived from stable row content (xxhash64 of all columns
mod n), not rand(), so plans stay deterministic and retries/speculative
tasks agree — important for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n) from the row's full content."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(n)).cast("int")
    )


def replicate(df: DataFrame, n: int, salt_col: str = "_salt") -> DataFrame:
    """Replicate each row n times with salt 0..n-1 (the small side)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution has hot keys.

    ``skewed`` gets a content-derived salt; ``other`` is replicated
    ``n_salts``×. Correctness: every (key, salt) pair on the skewed
    side meets exactly one replica of the matching key. Cost: the
    small side shuffles n× its size — choose n ≈ hot-key partition
    excess, not more.

    Returns columns of both inputs (salt dropped).

    Only ``inner`` and ``left`` (outer on the skewed side) are
    supported: replication of ``other`` makes right/full outer emit
    each unmatched replica (n_salts duplicates), and semi/anti joins
    drop ``other``'s columns that the output select needs.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left', got {how!r}: "
            "replicating the small side breaks right/full/semi/anti "
            "semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    a = with_salt(skewed, n_salts)
    b = replicate(other, n_salts)
    cond = [a[k] == b[k] for k in keys] + [a["_salt"] == b["_salt"]]
    joined = a.join(b, cond, how)
    keep = [a[c] for c in skewed.columns] + [
        b[c] for c in other.columns if c not in keys
    ]
    return joined.select(*keep)
