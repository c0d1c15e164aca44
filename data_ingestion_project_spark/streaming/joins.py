"""Stream-stream and stream-static joins over the events stream.

The stream-stream interval join is the streaming twin of the batch
as-of/range attribution queries (queries/events.purchase_last_click,
purchases_near_errors): a purchase joins the clicks that preceded it
within a bounded lag, with watermarks on BOTH sides plus the event-time
range condition — the two things Structured Streaming needs to know
when buffered rows can never match again and state can be dropped.
Without the time bound the join state would grow without limit on an
unbounded stream; with it, state is O(watermark × arrival rate)
regardless of total stream length.

The stream-static join broadcasts a small dimension table into each
micro-batch — no state at all, the streaming analog of the batch
broadcast-dimension joins used throughout queries/tpch.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    join_type: str = "inner",
) -> DataFrame:
    """Join each purchase to every click by the same user within
    ``max_lag`` BEFORE the purchase (event-time interval join).

    Both inputs are events-shaped streaming DataFrames
    (ts timestamp, user_id long, event_type string, value double).
    ``join_type='leftOuter'`` additionally emits purchases with no
    qualifying click once the watermark passes (nulls on the click
    side) — outer results are necessarily delayed by the watermark.
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    cond = (
        (F.col("c_user_id") == F.col("user_id"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_lag}"))
    )
    return p.join(c, cond, join_type).select(
        "user_id", "purchase_ts", "purchase_value", "click_ts"
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
) -> DataFrame:
    """Stream-static join: enrich each micro-batch with a broadcast
    dimension table. Stateless — the static side is re-resolved per
    micro-batch, so a replaced dimension snapshot is picked up without
    restarting the query."""
    return stream.join(F.broadcast(dim), key, "left")
