"""Single-pass table profiling (Deequ/Glue-profiler shape).

Complements operators/quality_checks.py: checks VERIFY declared
expectations; the profiler DISCOVERS the table's shape — per-column
null counts, distinct cardinality, min/max — the stats a pipeline
inspects before writing constraints, and the input to drift detection
(diff two profiles of the same table across snapshots).

Plan shape: one NARROW aggregation per column, unioned — each branch
scans exactly its one column (columnar pruning makes N single-column
scans the same total I/O as one full-width scan) and the branches run
as independent parallel stages. This deliberately avoids the
single-agg-with-N-DISTINCTs form: Catalyst plans that via an Expand
that multiplies every row N-fold before the shuffle (measured 3.6 s
vs 1.0 s on the 6-column orders profile at sf0.1). Exact distinct
counts keep the profile oracle-checkable; pass ``approximate=True``
to swap in HLL ``approx_count_distinct`` (fully partial-aggregatable,
no distinct shuffle at all) — the 100 TB default where a ±2%
cardinality is what you want from a profile anyway.
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
    parts = []
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approximate else F.countDistinct(c)
        )
        stats = df.select(c).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_if(F.col(c).isNull()).alias("n_nulls"),
            distinct.alias("n_distinct"),
            _as_profile_string(F.min(c), dtypes[c]).alias("min_value"),
            _as_profile_string(F.max(c), dtypes[c]).alias("max_value"),
        )
        parts.append(stats.select(F.lit(c).alias("column"), *stats.columns))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
