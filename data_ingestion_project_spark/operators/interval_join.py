"""Interval-overlap join via bucket decomposition — the scale pattern
for time-range joins that have NO equi key.

``points ⋈ intervals ON start <= ts <= end`` with no shared key column
gives Catalyst nothing to hash on: the physical plan is a
BroadcastNestedLoopJoin (or worse, a cartesian product) — every point
compared against every interval, O(|P|·|I|), the plan that dies first
at 100 TB. The standard fix (also how Spark's own stream-stream
interval joins and range-join hints in other engines work): quantize
time into coarse BUCKETS, explode each interval into the buckets it
spans, bucket each point once, and hash-join on the bucket — then
refine with the exact range predicate. Cost: one shuffle on bucket
keys, |I|·(span/bucket) exploded interval rows, and each (point,
interval) pair meets in EXACTLY the point's bucket, so no distinct is
needed afterwards.

Bucket sizing is the usual tradeoff: buckets ≪ typical span waste
explode rows; buckets ≫ span waste refine comparisons. A bucket near
the median span is within a small constant of optimal.

Reference parity: n/a (SURVEY.md header — no joins of any kind in the
reference); rubric category "range/interval join", scale form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bucket_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts <= end`` (plus equality on ``keys`` if given),
    through a bucket equi-join: intervals explode to the bucket range
    ``[floor(start/b), floor(end/b)]``, points bucket once at
    ``floor(ts/b)``, the join hashes on (keys..., bucket) and the
    exact predicate refines. Output columns: all point columns + all
    interval columns (so both sides' names must be disjoint apart from
    ``keys``)."""
    b = int(bucket_seconds)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / b),
                F.floor(F.unix_timestamp(F.col(end_col)) / b),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.floor(F.unix_timestamp(F.col(ts_col)) / b))
    on = [*keys, "__bucket"]
    joined = pt.join(iv, on, how).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("__bucket")
