"""Order-independent rounded aggregates for oracle-exact comparison.

A SUM of doubles is order-dependent (IEEE addition is not associative);
Spark's partial aggregation and DuckDB's scan order sum in different
orders, so ``ROUND(SUM(double), 2)`` can differ by one cent whenever
the true sum lands within float error of a .xx5 boundary — observed in
practice at sf0.1 (product_type_profit, 1 row in 175).

Fix: quantize each row to integer MICRO-UNITS (1e-6), accumulate the
integers exactly, round in the integer domain, divide back at the end.
Each step is value-determined and engine-mirrorable:

1. Per row, ``trunc(x * 1e6) -> int64``. The double product is
   bit-identical across engines (same inputs, same expression) and
   truncation toward zero is exact on both sides (Spark double→long
   cast; DuckDB ``trunc(...)::BIGINT``). One multiply + one cast — no
   per-row BigDecimal allocation, which is what made the previous
   double→DECIMAL(27,6) cast ~4x slower than a plain double sum
   (measured 1.8 s vs 0.43 s for 4 aggregates over sf0.1 lineitem).
2. Accumulate in DECIMAL(28,0) (Spark) / HUGEINT (DuckDB SUM over
   BIGINT): exact, associative — any partial-aggregation order gives
   the same total, and the decimal accumulator cannot overflow before
   ~1e28 micro-units (1e22 in money units; a 100 TB table of 1e5-sized
   values is ~1e17).
3. Round half-AWAY-FROM-ZERO to the output scale entirely in integer
   arithmetic — ``sign(s) * floor((|s| + half)/m)`` with m = 10^(6-scale)
   — then one exact integer→double conversion. The intermediate
   quotient has granularity 1/m ≥ 1e-4, far coarser than either
   engine's decimal-division precision, so the floor is exact.

The per-row quantization means values beyond 6 fractional digits are
truncated (not rounded) at 1e-6 before summing — a deliberate,
documented semantic both engines implement identically; the output
scale (cents) is orders of magnitude coarser. Bounds: |x| must stay
below ~9.2e12 so x*1e6 fits int64 (money-grade columns, not raw
physics doubles).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MICRO = 1_000_000  # per-row quantization: 1e-6 units
DEC_BUF = "decimal(28,0)"  # exact integer accumulator (headroom to 1e28)

# Legacy cast-to-decimal type, still used by call sites that pair an
# inline Spark expression with their own inline oracle SQL (both sides
# CAST(... AS DECIMAL(27,6)) — self-consistent, just slower than the
# micro-unit path; fine off the hot money aggregates).
DEC = "decimal(27,6)"


def to_micro(col: Column) -> Column:
    """Value-determined per-row quantization: trunc(x * 1e6) as int64."""
    return (col * F.lit(float(MICRO))).cast("long")


def dec_sum_partial(col: Column) -> Column:
    """Unrounded exact micro-unit sum — a RE-AGGREGATABLE partial:
    decimal addition is associative, so partials fold across any
    grouping (two-level CUBE/ROLLUP, salted aggregation) bit-equal to
    the single-level sum. Finish with :func:`dec_sum_final`."""
    return F.sum(to_micro(col).cast(DEC_BUF))


def dec_sum_final(sum_col: Column, scale: int = 2) -> Column:
    """Integer-domain half-away-from-zero rounding of a micro-unit sum
    (direct or folded partials), returned as double."""
    m = 10 ** (6 - scale)
    half = m // 2
    mag = F.floor((F.abs(sum_col) + F.lit(half)) / F.lit(m))
    signed = F.when(sum_col < 0, -mag).otherwise(mag)
    return (signed.cast("double") / F.lit(float(10**scale)))


def dec_sum(col: Column, scale: int = 2) -> Column:
    """Order-independent SUM of a double expression, rounded to scale."""
    return dec_sum_final(dec_sum_partial(col), scale)


def dec_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent AVG: exact micro-unit sum, then one double
    division mirrored operation-for-operation in sql_dec_avg."""
    return F.round(
        F.sum(to_micro(col).cast(DEC_BUF)).cast("double")
        / F.lit(float(MICRO))
        / F.count(col),
        scale,
    )


def _sql_micro_sum(expr: str) -> str:
    return f"SUM(CAST(trunc(({expr}) * 1000000) AS BIGINT))"


def sql_dec_sum(expr: str, scale: int = 2) -> str:
    m = 10 ** (6 - scale)
    half = m // 2
    s = _sql_micro_sum(expr)
    # // is DuckDB integer floor division — keeps the HUGEINT sum exact
    # (plain / would coerce to DOUBLE and lose cents on large sums)
    rounded = (
        f"(CASE WHEN {s} < 0 THEN -((ABS({s}) + {half}) // {m}) "
        f"ELSE (({s} + {half}) // {m}) END)"
    )
    return f"(CAST({rounded} AS DOUBLE) / {10**scale}.0)"


def sql_dec_avg(expr: str, scale: int = 4) -> str:
    return (
        f"ROUND(CAST({_sql_micro_sum(expr)} AS DOUBLE) / 1000000.0"
        f" / COUNT({expr}), {scale})"
    )


def spark_dec_sum(expr: str, scale: int = 2) -> str:
    """Spark-SQL-dialect twin of :func:`sql_dec_sum` for the queries
    that go through the engine's OWN SQL surface (``spark.sql`` over
    registered views). Same value semantics, different spellings:
    truncation toward zero is a plain double→BIGINT cast in Spark
    (DuckDB needs ``trunc`` because its cast rounds), and the integer
    floor-division is FLOOR over an exact decimal division (DuckDB
    uses ``//``; Spark's ``DIV`` returns BIGINT, which the decimal
    accumulator deliberately outranges). The division quotient has
    granularity 10^(scale-6) — far above decimal-division rounding —
    so FLOOR is exact, mirroring dec_sum_final."""
    m = 10 ** (6 - scale)
    half = m // 2
    s = f"SUM(CAST(CAST(({expr}) * 1000000 AS BIGINT) AS {DEC_BUF}))"
    mag = f"FLOOR((ABS({s}) + {half}) / {m})"
    rounded = f"(CASE WHEN {s} < 0 THEN -{mag} ELSE {mag} END)"
    return f"(CAST({rounded} AS DOUBLE) / {10**scale}.0)"


def floor_round(col: Column, scale: int) -> Column:
    """sign(x)·floor(|x|·10^s + 0.5)/10^s — half-away rounding of a
    value-determined DOUBLE spelled as IEEE ops that are bit-identical
    across engines; engine-library ROUND(double) implementations
    disagree on exact half boundaries (observed: a median landing on
    .885).  SQL mirror: sign(x) * floor(abs(x) * 10^s + 0.5) / 10^s."""
    s = F.lit(float(10**scale))
    return F.signum(col) * F.floor(F.abs(col) * s + F.lit(0.5)) / s
