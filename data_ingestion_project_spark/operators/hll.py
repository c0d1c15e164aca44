"""Portable deterministic HyperLogLog — register-level, cross-engine.

The Datasketches path (``F.hll_sketch_agg``) is the binary-blob
production rollup, but its sketch bytes are opaque: no other engine
can replay them, so a query built on it can only ever get a rows-only
correctness check. This module implements classic HLL (Flajolet,
Fusy, Gandouet, Meunier 2007) with every ingredient chosen to be
REPLAYABLE AS ANSI SQL:

- hash: first 15 hex chars of md5(key) as a 60-bit BIGINT (the same
  portable-hash idiom as the KMV and quantile-sketch oracle modes);
- bucket = hash % m (p low bits), w = hash // m (the remaining
  60 - p bits), rho = leading-zero count of w + 1 computed by integer
  BIT LENGTH (``length(bin(w))``) — no floating log anywhere;
- registers: MAX(rho) per (group, bucket) — a tiny mergeable state
  (m small ints per group); the period rollup is register-wise MAX
  across groups, the exact HLL union, demonstrated on real stored
  registers rather than opaque sketch bytes;
- estimator: raw = alpha_m * m^2 / sum(2^-M_j), folded EXACTLY in
  int64 as S = sum(2^(R_MAX - M_j)) (one IEEE division at the end),
  with the standard small-range linear-counting branch
  m * ln(m / V) quantized through an integer micro-step so both
  engines agree bit-for-bit (one libm ln per DISTINCT empty-bucket
  count — the house ln-quantization rule).

Scale posture: the corpus is read once into (group, bucket) registers
— a partial-aggregate shuffle bounded by groups x m rows; every
rollup after that touches registers only (KB per group), never the
fact table. Accuracy ~1.04/sqrt(m) in the raw regime and better in
the linear-counting regime; floors pinned in pytest.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# p = 10 -> m = 1024 buckets; 60-bit hash leaves 50 bits for rho
# (rho in 1..51, 51 reserved for w == 0). R_MAX = 51 scales the exact
# integer fold: terms 2^(51-M) are <= 2^50 for present buckets and
# 2^51 for empties, so S <= m * 2^51 = 2^61 — int64-safe.
HLL_P = 10
HLL_M = 1 << HLL_P
_R_MAX = 51
# alpha_m * m^2 * 2^R_MAX, one Python float literal shared by the
# Spark plan and the SQL oracle text (repr round-trips exactly).
HLL_ALPHA_NUM = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(1 << _R_MAX)
_LC_CUT = 2.5 * HLL_M  # linear-counting threshold on the raw estimate
_MICRO = 100000000.0  # 1e8 ln-quantization step


def md5_int60(col: Column) -> Column:
    """First 15 hex chars of md5(col) as a 60-bit non-negative BIGINT."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")


def sql_md5_int60(hex_col: str = "hx") -> str:
    """DuckDB replay of :func:`md5_int60` over a precomputed md5-hex
    column: positional hex-digit arithmetic, integer-exact."""
    return " + ".join(
        f"(strpos('0123456789abcdef', substr({hex_col}, {i + 1}, 1)) - 1)"
        f" * {16 ** (15 - 1 - i)}"
        for i in range(15)
    )


def hll_registers(df: DataFrame, hash_col: Column, group_cols: list[str]) -> DataFrame:
    """(group_cols..., bucket, m_reg) — the HLL register table.

    ``hash_col`` must be a 60-bit non-negative long (md5_int60).
    Registers are the canonical mergeable HLL state: re-aggregate with
    MAX(m_reg) per bucket to union groups.
    """
    w = F.expr(f"__hv DIV {HLL_M}")
    rho = F.when(w == 0, F.lit(_R_MAX)).otherwise(
        F.lit(_R_MAX) - F.length(F.bin(w))
    )
    return (
        df.select(*group_cols, hash_col.alias("__hv"))
        .distinct()
        .select(
            *group_cols,
            (F.col("__hv") % HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table to (group_cols..., est_users).

    Exact-integer fold S = sum(2^(51 - M_j)) + empties * 2^51, then
    ONE double division raw = HLL_ALPHA_NUM / S; linear counting
    m*ln(m/V) when raw <= 2.5m and V > 0, ln quantized to 1e-8 so the
    estimate is a deterministic integer in any IEEE engine.
    """
    folded = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {_R_MAX} - m_reg)")).alias(
            "s_present"
        ),
    )
    s = F.col("s_present") + (F.lit(HLL_M) - F.col("n_present")) * F.lit(
        1 << _R_MAX
    ).cast("long")
    v = (F.lit(HLL_M) - F.col("n_present")).cast("long")
    raw = F.lit(HLL_ALPHA_NUM) / s.cast("double")
    q = F.round(
        F.log(F.lit(float(HLL_M)) / F.greatest(v, F.lit(1)).cast("double"))
        * F.lit(_MICRO),
        0,
    ).cast("long")
    lc = F.floor(F.lit(float(HLL_M)) * q / F.lit(_MICRO) + F.lit(0.5)).cast("long")
    est = F.when((raw <= F.lit(_LC_CUT)) & (v > 0), lc).otherwise(
        F.floor(raw + F.lit(0.5)).cast("long")
    )
    return folded.select(*group_cols, est.alias("est_users"))


def sql_hll_estimate(reg_rel: str, group_col: str) -> str:
    """DuckDB replay of :func:`hll_estimate` over a register relation
    ``reg_rel`` with columns (group_col, bucket, m_reg). Returns a
    SELECT producing (group_col, est_users)."""
    return f"""
SELECT {group_col},
       CASE WHEN ({HLL_ALPHA_NUM!r} / s_d) <= {_LC_CUT!r} AND v > 0
            THEN CAST(floor({float(HLL_M)!r} *
                   CAST(round(ln({float(HLL_M)!r} / greatest(v, 1)) * {_MICRO!r}) AS BIGINT)
                   / {_MICRO!r} + 0.5) AS BIGINT)
            ELSE CAST(floor({HLL_ALPHA_NUM!r} / s_d + 0.5) AS BIGINT) END AS est_users
FROM (
  SELECT {group_col},
         CAST(s_present + ({HLL_M} - n_present) * (CAST(1 AS BIGINT) << {_R_MAX}) AS DOUBLE) AS s_d,
         CAST({HLL_M} - n_present AS BIGINT) AS v
  FROM (
    SELECT {group_col}, COUNT(*) AS n_present,
           SUM(CAST(1 AS BIGINT) << ({_R_MAX} - m_reg)) AS s_present
    FROM {reg_rel} GROUP BY {group_col}
  )
)
"""
