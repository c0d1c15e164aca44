"""Order-independent rounded aggregates for oracle-exact comparison.

A SUM of doubles is order-dependent (IEEE addition is not associative);
Spark's partial aggregation and DuckDB's scan order sum in different
orders, so ``ROUND(SUM(double), 2)`` can differ by one cent whenever
the true sum lands within float error of a .xx5 boundary — observed in
practice at sf0.1 (product_type_profit, 1 row in 175).

Fix: accumulate in DECIMAL. Per-row doubles are bit-identical across
engines (same inputs, same expression), the double→DECIMAL(27,6) cast
is value-determined, decimal addition is exact and associative, and
both engines round DECIMAL half-away-from-zero (verified empirically —
note DuckDB's decimal CAST truncates, so the oracle must use ROUND,
not CAST, for the final scale reduction). The result is exact equality
at any scale factor, not a probabilistic match.

Cost note: decimal aggregation is ~2x the cycles of double aggregation
but stays codegen'd JVM-side; for the bench workloads the difference
is noise. At 100 TB the same trade buys reproducible results across
partitionings — worth it for any money column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(27,6)"


def dec_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded to scale."""
    return F.round(F.sum(col.cast(DEC)), scale).cast("double")


def dec_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact decimal sum, then one double division."""
    return F.round(F.sum(col.cast(DEC)).cast("double") / F.count(col), scale)


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(27,6))), {scale}) AS DOUBLE)"


def sql_dec_avg(expr: str, scale: int = 4) -> str:
    return f"ROUND(CAST(SUM(CAST({expr} AS DECIMAL(27,6))) AS DOUBLE) / COUNT({expr}), {scale})"
