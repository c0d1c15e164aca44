"""Single-pass table profiling (Deequ/Glue-profiler shape).

Complements operators/quality_checks.py: checks VERIFY declared
expectations; the profiler DISCOVERS the table's shape — per-column
null counts, distinct cardinality, min/max — the stats a pipeline
inspects before writing constraints, and the input to drift detection
(diff two profiles of the same table across snapshots).

Plan shape: ONE wide aggregation over the table computes every
column's stats simultaneously (Catalyst plans multiple DISTINCT
aggregates via a single expand + two-phase agg — one pass over the
data, not one scan per column), then a literal-sized unpivot emits
one row per column. Exact distinct counts keep the profile
oracle-checkable; pass ``approximate=True`` to swap in HLL
``approx_count_distinct`` (no expand, fully partial-aggregatable) —
the 100 TB default where a ±2% cardinality is what you want from a
profile anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    TimestampNTZType,
    TimestampType,
)

_INT_TYPES = (ByteType, ShortType, IntegerType, LongType)
_FLOAT_TYPES = (FloatType, DoubleType)
_TS_TYPES = (TimestampType, TimestampNTZType)


def _as_profile_string(col: F.Column, dtype) -> F.Column:
    """Render a min/max value to a STRING deterministically and
    engine-mirrorably: ints as plain digits, floats at fixed 4-decimal
    precision (shortest-repr float printing differs across engines),
    timestamps at second precision."""
    if isinstance(dtype, _INT_TYPES):
        return col.cast("string")
    if isinstance(dtype, _FLOAT_TYPES):
        return F.format_string("%.4f", col.cast("double"))
    if isinstance(dtype, _TS_TYPES):
        return F.date_format(col, "yyyy-MM-dd HH:mm:ss")
    return col.cast("string")


def profile_table(
    df: DataFrame, cols: list[str] | None = None, approximate: bool = False
) -> DataFrame:
    """Profile ``cols`` (default: every column) of ``df``.

    Returns one row per column:
    (column, n_rows, n_nulls, n_distinct, min_value, max_value)
    with min/max rendered as strings (see _as_profile_string).
    ``n_distinct`` ignores NULLs (COUNT(DISTINCT col) semantics in
    both Spark and ANSI SQL).
    """
    if cols is None:
        cols = df.columns
    dtypes = dict(zip(df.schema.names, [f.dataType for f in df.schema.fields]))
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approximate else F.countDistinct(c)
        )
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            _as_profile_string(F.min(c), dtypes[c]).alias(f"{c}__min"),
            _as_profile_string(F.max(c), dtypes[c]).alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("__rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_value"),
            F.col(f"{c}__max").alias("max_value"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("p")).select("p.*")
