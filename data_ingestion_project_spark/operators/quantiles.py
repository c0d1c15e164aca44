"""Distributed equal-frequency bucketing (scale-safe ntile).

``ntile(k)`` over an unpartitioned ``Window.orderBy`` funnels the whole
table through ONE task — the classic single-partition-sort scale
killer. This operator computes the *same* assignment (including
tiebreak columns) with a distributed two-pass plan:

1. Range-bucket rows by value using explicit cut-points from
   ``approxQuantile`` (a driver-side single pass). Explicit boundaries
   — not ``repartitionByRange`` — because the RangePartitioner's
   reservoir sampling is not guaranteed to pick identical boundaries
   across the two jobs that follow; an explicit boundary array is a
   pure function of the data. Boundary accuracy only affects load
   balance, never correctness: equal values always map to one bucket.
2. Rank locally inside each bucket (window partitioned by bucket id —
   parallel, no global sort), count rows per bucket (tiny driver
   collect, one row per bucket), convert local ranks to exact global
   ranks via cumulative offsets, and apply Spark's ntile split rule
   (first N % k buckets get ceil(N/k) rows).

Cost: one approxQuantile pass + one count pass + one ranking pass —
three scans instead of ntile's one, but every stage is parallel; at
100 TB three parallel scans beat one serial sort by orders of
magnitude. The driver state is O(n_buckets), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def equal_frequency_buckets(
    df: DataFrame,
    value_col: str,
    k: int,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "bucket",
    range_partitions: int = 32,
) -> DataFrame:
    """Attach a 1-based ``out_col`` equal to
    ``ntile(k) OVER (ORDER BY value_col, *tiebreak_cols)`` — computed
    without a single-partition window.

    Rows with NULL ``value_col`` are excluded (approxQuantile ignores
    them; an ntile twin must filter them identically).
    """
    tiebreak_cols = tiebreak_cols or []
    df = df.filter(F.col(value_col).isNotNull())

    # Pass 1: range boundaries. p-1 interior quantiles for p ranges;
    # accuracy only shapes balance (1e-3 keeps driver state tiny).
    probs = [i / range_partitions for i in range(1, range_partitions)]
    bounds = sorted(set(df.approxQuantile(value_col, probs, 0.001)))
    if bounds:
        barr = F.array(*[F.lit(b) for b in bounds])
        range_id = F.size(F.filter(barr, lambda b: b < F.col(value_col)))
    else:  # constant column → one range
        range_id = F.lit(0)
    ranged = df.withColumn("__rid", range_id)

    # Pass 2: per-range counts → cumulative offsets (driver-side,
    # O(range_partitions) rows — metadata scale, not data scale).
    counts = {r["__rid"]: r["n"] for r in ranged.groupBy("__rid").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    offsets: dict[int, int] = {}
    acc = 0
    for rid in sorted(counts):
        offsets[rid] = acc
        acc += counts[rid]

    # Pass 3: local rank inside each range + offset = exact global rank.
    order = [F.col(value_col).asc(), *[F.col(c).asc() for c in tiebreak_cols]]
    w = Window.partitionBy("__rid").orderBy(*order)
    offset_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]), F.col("__rid")
    )
    # long arithmetic: row_number() is int32 and the offset literals are
    # int-typed when small — at >2^31 rows the un-cast addition would
    # silently wrap in non-ANSI mode, in exactly the operator that
    # exists for that scale.
    r = (F.row_number().over(w).cast("long") + offset_expr.cast("long")).alias("__grank")

    # Spark ntile split: first m = N % k buckets take q+1 rows (q = N//k).
    q, m = divmod(total, k)
    head = m * (q + 1)
    grank = F.col("__grank")
    if q == 0:  # fewer rows than buckets: bucket == rank
        bucket = grank
    else:
        bucket = F.when(grank <= head, ((grank - 1) / (q + 1)).cast("long") + 1).otherwise(
            F.lit(m) + ((grank - head - 1) / q).cast("long") + 1
        )
    return (
        ranged.withColumn("__grank", r)
        .withColumn(out_col, bucket.cast("int"))
        .drop("__rid", "__grank")
    )
