"""As-of join (point-in-time join) — an operator Spark lacks natively.

Semantics: for every left row, attach the latest right row whose
timestamp is <= the left timestamp (direction="backward", inclusive),
matched within the same key group. Equivalent to pandas
``merge_asof`` / DuckDB ``ASOF JOIN``.

Implementation strategy (the scale-aware choice): a *union + window*
plan rather than a range join.

- Range-join formulation (``l.ts >= r.ts`` + row_number) explodes to
  O(|L| x |R| per key) intermediate rows before pruning — fatal when a
  key has millions of right rows at 100 TB.
- Union formulation: tag both sides, union, single shuffle on the key,
  one in-order window pass carrying the last-seen right-side payload
  forward (``last(..., ignorenulls=True)``). Cost is one shuffle +
  one sort of |L| + |R| — the same plan a native as-of implementation
  (e.g. QuestDB/kdb-style) would execute, expressed declaratively.

Skew note: a hot key (one user with 1e8 events) concentrates in one
partition; AQE skew-join doesn't apply to windows, so at that scale
pre-split hot keys by a time-bucket salt and stitch the last value of
each bucket forward (not needed at current data sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str] | None = None,
    suffix: str = "_asof",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Backward (inclusive) as-of join of ``right`` onto ``left``.

    Returns ``left`` with ``<payload><suffix>`` columns attached; left
    rows with no prior right row get nulls (LEFT ASOF semantics).

    Tie handling: two right rows with the same key AND identical
    timestamp are ordered by ``right_tiebreak`` (any right column —
    it need not be in ``right_payload``; it rides the internal struct
    without appearing in the output) when given, else by the payload
    struct itself (lexicographic by field) — the *greatest* one wins.
    Without this the carried payload would depend on partitioning/run
    order. Pass ``right_tiebreak`` explicitly if the payload contains
    unorderable types (maps); for full determinism it should be unique
    per (key, timestamp) — equal-or-null tiebreak values still resolve
    by arrival order.
    """
    right_payload = right_payload or [c for c in right.columns if c not in on and c != right_ts]
    struct_fields = list(right_payload)
    if right_tiebreak is not None and right_tiebreak not in struct_fields:
        if right_tiebreak not in right.columns:
            raise ValueError(
                f"right_tiebreak {right_tiebreak!r} is not a column of the right side"
            )
        struct_fields.append(right_tiebreak)

    # A right row with a NULL timestamp has no defined position in event
    # time; NULLS FIRST ordering would otherwise carry its payload into
    # left rows that precede every real right row (fabricated matches).
    right = right.filter(F.col(right_ts).isNotNull())

    # The payload is carried as ONE struct, not per-column: per-column
    # last(ignorenulls) would mix fields from different right rows
    # whenever the latest right row holds nulls, fabricating rows that
    # never existed. A struct is non-null for every right row (even if
    # all its fields are null), so last(struct, ignorenulls) always
    # selects the latest right ROW as a unit.
    payload_struct = F.struct(*[F.col(p).alias(p) for p in struct_fields])
    payload_type = right.select(payload_struct.alias("s")).schema["s"].dataType

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__is_left"),
        F.col(left_ts).alias("__ts"),
        F.lit(None).cast(payload_type).alias("__r"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
        *[F.col(c) for c in on],
        F.lit(0).alias("__is_left"),
        F.col(right_ts).alias("__ts"),
        payload_struct.alias("__r"),
    ).select(*l_tag.columns)  # align column order for unionByName safety

    # Right rows sort before left rows at equal timestamps → inclusive (>=).
    # __r as the final sort key makes equal-(key,ts) right rows resolve
    # deterministically (greatest payload wins) instead of by arrival
    # order; left rows all have __r NULL so their relative order is
    # irrelevant (each computes its own window value independently).
    if right_tiebreak is not None:
        tb = F.col("__r").getField(right_tiebreak).asc_nulls_first()
    else:
        tb = F.col("__r").asc_nulls_first()
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc(), tb)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *[F.col(c) for c in left.columns],
        F.col("__is_left"),
        F.last(F.col("__r"), ignorenulls=True).over(w).alias("__carried"),
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"__carried.{p}").alias(f"{p}{suffix}") for p in right_payload],
        )
    )
