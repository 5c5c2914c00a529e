"""Streaming joins: stream-static enrichment and watermarked
stream-stream interval joins.

The reference has no event streams (its "streaming" is the unbounded
stdin pipe, main.rs:261-269) — these complete the Structured Streaming
surface our engine promises for the events-table pattern. Both helpers
accept streaming OR batch DataFrames (watermarks are a no-op in
batch), so each streaming query has a batch twin running the
identical code path — that twin is what the parity tests compare.

Scale notes:

- stream-static: the dim side broadcasts per micro-batch (re-resolved
  each batch, so a slowly-changing dim picks up updates); no stream
  state at all.
- stream-stream: BOTH sides watermark and the join condition bounds
  event-time distance, so each side's buffered state is
  O(rate × (watermark + lag)) — without the time bound Spark would
  buffer both streams forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str = "user_id"
) -> DataFrame:
    """Stream-static left join: decorate each event with its dimension
    row. The static side is broadcast — each micro-batch is a map-side
    join, no shuffle of the stream and no streaming state."""
    return events.join(F.broadcast(dim), on, "left")


def attribute_purchases(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag_minutes: int = 30,
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every
    click by the same user in the preceding ``max_lag_minutes``.

    Both inputs are event streams (or their batch twins) with
    (user_id, event_id, ts, value). The equi key (user_id) keeps it a
    hash join; the event-time interval condition lets Spark expire
    buffered rows once the watermark passes click_ts + lag.

    ``how="leftOuter"`` keeps unattributed clicks (conversion-funnel
    accounting needs the misses, not just the hits). Outer semantics
    under streaming: a click's NULL row is emitted only when the
    watermark passes ``click_ts + lag`` — i.e., once no future
    purchase could still match it. Clicks younger than the final
    watermark stay buffered and never emit in a finite run; the batch
    twin has no such horizon, so outer parity tests must compare only
    the expired region (see tests/test_streaming.py).
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_lag_minutes} MINUTES")
        ),
        how,
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        "click_ts",
        "purchase_ts",
        F.round("purchase_value", 2).alias("purchase_value"),
    )
