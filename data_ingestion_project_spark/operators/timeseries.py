"""Time-series regularization: date spines, gap-filling, forward fill.

The reference has no time-series surface (SURVEY.md §1.1: timestamps
stay unparsed ISO strings end-to-end, `ingestion/transformations.py:35`);
this module adds the hypertable-style resample/gap-fill operators a
metrics pipeline needs, composed from built-ins only:

- the spine is ``sequence() + explode`` on a ONE-ROW frame — O(days)
  rows generated driver-free, then ``F.broadcast`` against the distinct
  keys (the spine side is always tiny: 10 years of days is 3 653 rows);
- the observed aggregate shuffles once on (key, day);
- forward-fill is ``last(ignorenulls)`` over a window partitioned BY
  KEY — never a global single-partition window; state per task is one
  key's days.

At 100 TB the expensive side (the fact scan + one partial agg) stays a
single shuffle; the spine join broadcasts. Skewed keys behave like any
grouped agg (AQE skew split applies).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def date_spine(spark: SparkSession, start: str, end: str) -> DataFrame:
    """One row per day in [start, end] (inclusive), column ``day`` of
    type date. Generated as sequence+explode: no driver-side loop, no
    collect; Catalyst constant-folds the sequence bounds."""
    one = spark.range(1)  # a 1-row frame to hang the sequence on
    return one.select(
        F.explode(
            F.sequence(
                F.lit(start).cast("date"),
                F.lit(end).cast("date"),
                F.expr("interval 1 day"),
            )
        ).alias("day")
    )


def gap_fill_daily(
    observed: DataFrame,
    spark: SparkSession,
    key_col: str,
    value_col: str,
    start: str,
    end: str,
    fill_value: float | None = 0.0,
) -> DataFrame:
    """Densify a (key, day, value) frame onto the full key × day grid.

    ``observed`` must carry one row per (key, day) — aggregate first.
    Missing grid cells get ``fill_value`` in ``{value_col}_filled`` and
    a forward-filled last observation in ``{value_col}_ffill`` (null
    until the key's first observation — no look-behind before the
    window start, matching standard resample semantics).
    """
    spine = date_spine(spark, start, end)
    keys = observed.select(key_col).distinct()
    grid = keys.join(F.broadcast(spine), how="cross")
    dense = grid.join(observed, on=[key_col, "day"], how="left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled: Column = (
        F.coalesce(F.col(value_col), F.lit(fill_value))
        if fill_value is not None
        else F.col(value_col)
    )
    return dense.select(
        key_col,
        "day",
        filled.alias(f"{value_col}_filled"),
        F.last(value_col, ignorenulls=True).over(w).alias(f"{value_col}_ffill"),
    )
