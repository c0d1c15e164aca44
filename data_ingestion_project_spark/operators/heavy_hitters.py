"""Approximate frequent items (heavy hitters) via mergeable
Misra-Gries summaries — the frequent-items member of the sketch family
next to the HLL/theta distinct sketches in queries/events.py.

Why not just groupBy().count().orderBy().limit()? That plan shuffles
the ENTIRE key universe (every distinct word of a 100 TB corpus) to
build counts it then throws away. The MG path is one linear pass with
O(M) memory per partition and a summary-sized shuffle: each partition
emits at most M (item, weight) rows, so the exchange moves
O(M × partitions) rows regardless of data size or key cardinality.

Algorithm (Misra-Gries '82; merge per Agarwal et al., "Mergeable
Summaries", PODS'12): maintain M counters; an unseen item evicts by
decrementing ALL counters (implemented batched: subtract the
(M+1)-largest weight). Guarantees after merging partition summaries
with an exact groupBy-sum:

- every item with true frequency > n/(M+1) is PRESENT in the summary;
- each reported weight is a LOWER bound, short by at most n/(M+1)
  (errors only subtract — the decrements).

Both properties are pinned by property tests against exact counts.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_fold(counters: dict, items: pd.Series, capacity: int) -> None:
    """Fold one batch of item counts into the MG counter dict in place,
    keeping at most ``capacity`` counters (batched decrement)."""
    for item, cnt in items.value_counts().items():
        counters[item] = counters.get(item, 0) + int(cnt)
    if len(counters) > capacity:
        # batched eviction: subtracting the (capacity+1)-largest weight
        # from everyone zeroes-or-negates all smaller counters — the
        # same net effect as that many single-item decrement rounds
        cut = sorted(counters.values(), reverse=True)[capacity]
        for item in list(counters):
            c = counters[item] - cut
            if c > 0:
                counters[item] = c
            else:
                del counters[item]


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    capacity: int = 4096,
    k: int | None = None,
) -> DataFrame:
    """Approximate item frequencies: (item, est_count) with est_count a
    lower bound short by at most total_rows/(capacity+1).

    Plan: mapInPandas folds each partition's Arrow batches into one MG
    summary of ≤ capacity counters (generator state persists across a
    partition's batches, so memory is O(capacity) however large the
    partition); the ≤ capacity×partitions summary rows take ONE small
    shuffle for the exact merge-sum; ``k`` adds a TakeOrdered. NULL
    items are ignored (SQL aggregate convention).
    """

    def _summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            _mg_fold(counters, pdf[item_col].dropna(), capacity)
        yield pd.DataFrame(
            {item_col: list(counters.keys()), "w": list(counters.values())}
        )

    field = df.schema[item_col]
    summaries = df.select(item_col).mapInPandas(
        _summarize, schema=f"{field.name} {field.dataType.simpleString()}, w long"
    )
    merged = summaries.groupBy(item_col).agg(F.sum("w").alias("est_count"))
    if k is not None:
        merged = merged.orderBy(F.col("est_count").desc(), F.col(item_col).asc()).limit(k)
    return merged
