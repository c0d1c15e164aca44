"""Gap-based sessionization of an event stream (batch formulation).

Assigns a session id per (key, ordered events) where a new session
starts whenever the gap to the previous event exceeds ``gap_seconds``.
One shuffle on the key, two window passes, all codegen'd — the standard
scalable formulation (lag → boundary flag → running sum).

The streaming twin of this operator is
``streaming.sessionize_stream`` (session windows with watermarks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    order_tiebreak: str | None = None,
    session_col: str = "session_id",
) -> DataFrame:
    """Add ``session_col``: 1-based session index within each key."""
    order_cols = [F.col(ts).asc()]
    if order_tiebreak:
        order_cols.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order_cols)

    # timestampdiff at MICROSECOND resolution: integer-exact and valid
    # for both TIMESTAMP and TIMESTAMP_NTZ (a double cast would reject
    # NTZ and lose sub-second precision)
    prev_ts = F.lag(F.col(ts)).over(w)
    with_prev = df.withColumn("__prev_ts", prev_ts)
    gap_us = F.expr(f"timestampdiff(MICROSECOND, __prev_ts, `{ts}`)")
    is_new = F.when(F.col("__prev_ts").isNull() | (gap_us > gap_seconds * 1_000_000), 1).otherwise(0)
    return with_prev.withColumn(
        session_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    ).drop("__prev_ts")
