"""Slowly-changing dimension, type 2 (SCD2): versioned dimension rows
with [valid_from, valid_to) validity intervals — the warehouse pattern
for "what did this customer's attributes look like WHEN the fact
happened", which a plain upsert (operators/upsert.py, latest-wins)
destroys.

Design: pure functions over DataFrames — the caller persists the new
state (operators/txn_table.overwrite gives it snapshot isolation and
time travel over the HISTORY TABLE ITSELF, two orthogonal time axes).

Scale shape: one shuffle on the dimension key for the sequencing
window (per-key partitions are version counts — tiny), and the as-of
lookup is a filter, not a join. Change detection is a null-safe struct
comparison against the previous version, so a re-applied batch is a
no-op (idempotent ingestion) and unchanged attribute refreshes never
mint spurious versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

VALID_FROM, VALID_TO = "valid_from", "valid_to"


def scd2_apply(
    state: DataFrame | None,
    updates: DataFrame,
    key: str,
    attrs: list[str],
    ts_col: str,
) -> DataFrame:
    """Fold ``updates`` (key, attrs..., ts_col) into SCD2 ``state``
    (key, attrs..., valid_from, valid_to; valid_to NULL = current).

    The OPEN segment of each key (its current row) is re-sequenced
    together with that key's updates: order by timestamp (update wins
    ties — it is the newer information), drop versions whose attributes
    equal the previous surviving version (null-safe), close each
    survivor at the next survivor's start. Closed history is immutable
    — late updates older than the current row belong to a history
    REBUILD, not an apply (documented contract, enforced by nothing
    cheaper than a rebuild). ``updates`` must carry at most one row
    per (key, timestamp) — dedupe upstream; two same-instant versions
    have no defined order. ``state=None`` starts an empty dimension.
    """
    upd = updates.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__is_upd"),
    )
    if state is None:
        cand, closed = upd, None
    else:
        open_rows = state.filter(F.col(VALID_TO).isNull()).select(
            F.col(key),
            *[F.col(a) for a in attrs],
            F.col(VALID_FROM).alias("__ts"),
            F.lit(0).alias("__is_upd"),
        )
        closed = state.filter(F.col(VALID_TO).isNotNull())
        cand = open_rows.unionByName(upd)

    seq = Window.partitionBy(key).orderBy(F.col("__ts").asc(), F.col("__is_upd").asc())
    attrs_struct = F.struct(*[F.col(a) for a in attrs])
    changed = cand.withColumn("__prev", F.lag(attrs_struct).over(seq)).filter(
        F.col("__prev").isNull() | ~attrs_struct.eqNullSafe(F.col("__prev"))
    ).drop("__prev")
    # re-rank the SURVIVORS: each version closes when the next distinct
    # version begins. __is_upd stays in the order — a same-instant
    # correction (update sharing the open row's valid_from) must sort
    # AFTER the stale row deterministically, or lead() ties on __ts and
    # the correction can silently lose. The superseded row becomes a
    # zero-length [T, T) version, dropped below; its predecessor's
    # valid_to and its successor's valid_from both equal T, so the
    # interval chain stays contiguous.
    seq2 = Window.partitionBy(key).orderBy(F.col("__ts").asc(), F.col("__is_upd").asc())
    versioned = changed.select(
        F.col(key),
        *[F.col(a) for a in attrs],
        F.col("__ts").alias(VALID_FROM),
        F.lead("__ts").over(seq2).alias(VALID_TO),
    ).filter(F.col(VALID_TO).isNull() | (F.col(VALID_TO) != F.col(VALID_FROM)))
    return versioned if closed is None else closed.unionByName(versioned)


def scd2_as_of(state: DataFrame, ts) -> DataFrame:
    """The dimension as it was at ``ts``: the unique version per key
    with valid_from <= ts < valid_to (open-ended for current rows).
    A filter — no join, no window; at scale it composes with partition
    pruning if the history is laid out by valid_from range."""
    t = F.lit(ts)
    return state.filter(
        (F.col(VALID_FROM) <= t)
        & (F.col(VALID_TO).isNull() | (F.col(VALID_TO) > t))
    )
