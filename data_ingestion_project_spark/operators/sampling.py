"""Weighted reservoir sampling WITHOUT replacement (A-ES) — the
fixed-budget sampling member of the corpus-assembly family, next to
per-stratum Bernoulli rates (stratified_sample_rates) and importance
REWEIGHTING (operators/dsir.py): pick exactly k records with inclusion
probability proportional to a weight column (token counts, quality
scores), the primitive behind "fill a 10B-token budget from these
sources, long documents proportionally more likely".

Algorithm (Efraimidis & Spirakis 2006, the exponential-race form):
every record draws u ~ Uniform(0,1] and keeps key = ln(u)/w — the k
LARGEST keys (equivalently the k smallest exponential arrival times
-ln(u)/w) are the sample. This is exactly weighted sampling without
replacement, and it is MERGEABLE: top-k by key of a union is the
top-k of concatenated per-partition top-k's, so the physical plan is
one TakeOrderedAndProject — a per-partition heap fold plus a k-row
driver merge, no shuffle, no corpus-wide sort (the same fold shape as
the KMV sketch).

Determinism & oracle parity: u is the 48-bit md5 prefix of
``salt:id`` (+1, so u ∈ (0,1]), the engine-portable KMV/DP-release
draw idiom; ln(u) is quantized to 1e-4 nats (the NB/bigram/DP integer
ln idiom — absorbs cross-libm ulp differences), and the sort key is
the IEEE division of that BIGINT by the BIGINT weight — identical in
Spark and DuckDB, which is what lets a RANDOMIZED sample be certified
value-exactly (queries/documents.weighted_sample_audit). Production
runs vary ``salt`` per draw; determinism-under-replay is also what a
re-executed stage needs so a retry produces the same sample.

Reference parity: n/a — the reference ETL (SURVEY.md header) has no
sampling surface; north-star training-data component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

AES_SPACE = 1 << 48  # 12 hex digits of md5
LN_QUANTUM = 10_000  # 1e-4 nats — the repo's integer-ln idiom


def sample_key(id_col: Column, weight_col: Column, salt: str = "aes") -> Column:
    """The A-ES race key ln(u)/w as a deterministic, engine-portable
    expression: u = (48-bit md5 prefix of ``salt:id`` + 1) / 2^48,
    ln(u) quantized to integer 1e-4 nats, divided by the integer
    weight (double division of exact integers — bit-identical
    cross-engine). Larger key == earlier arrival == sampled first."""
    t = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long") + F.lit(1)
    u = t.cast("double") / F.lit(float(AES_SPACE))
    lnq = F.round(F.log(u) * LN_QUANTUM, 0).cast("long")
    return lnq.cast("double") / weight_col.cast("long")


def weighted_sample(
    df: DataFrame,
    k: int,
    id_col: str,
    weight_col: str,
    salt: str = "aes",
) -> DataFrame:
    """Exactly-k weighted sample without replacement: the k largest
    race keys, id tie-break. ``orderBy().limit(k)`` compiles to
    TakeOrderedAndProject — per-partition top-k heaps merged on the
    driver, never a global sort or single-partition window — so the
    cost is one scan regardless of cluster size. Weights must be
    positive integers (token/char counts)."""
    keyed = df.withColumn(
        "sample_key", sample_key(F.col(id_col), F.col(weight_col), salt=salt)
    )
    return keyed.orderBy(
        F.col("sample_key").desc(), F.col(id_col).asc()
    ).limit(k)
