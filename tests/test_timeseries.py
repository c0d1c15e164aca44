"""Unit tests for operators/timeseries.py (date spine + gap fill)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.timeseries import date_spine, gap_fill_daily


def test_date_spine_inclusive_bounds(spark):
    days = [r.day for r in date_spine(spark, "2024-03-01", "2024-03-05").collect()]
    assert days == [datetime.date(2024, 3, d) for d in range(1, 6)]


def test_gap_fill_zero_and_forward_fill(spark):
    observed = spark.createDataFrame(
        [
            ("a", datetime.date(2024, 1, 1), 10.0),
            ("a", datetime.date(2024, 1, 3), 30.0),
            ("b", datetime.date(2024, 1, 2), 5.0),
        ],
        "key string, day date, v double",
    )
    out = gap_fill_daily(observed, spark, "key", "v", "2024-01-01", "2024-01-04")
    rows = {(r.key, r.day.day): (r.v_filled, r.v_ffill) for r in out.collect()}
    # full grid: 2 keys x 4 days
    assert len(rows) == 8
    # observed cells keep their value in both columns
    assert rows[("a", 1)] == (10.0, 10.0)
    assert rows[("a", 3)] == (30.0, 30.0)
    # gap: zero-filled, forward fill carries the last observation
    assert rows[("a", 2)] == (0.0, 10.0)
    assert rows[("a", 4)] == (0.0, 30.0)
    # before a key's first observation: fill value, ffill stays null
    assert rows[("b", 1)] == (0.0, None)
    assert rows[("b", 3)] == (0.0, 5.0)


def test_gap_fill_none_fill_keeps_nulls(spark):
    observed = spark.createDataFrame(
        [("a", datetime.date(2024, 1, 2), 7.0)], "key string, day date, v double"
    )
    out = gap_fill_daily(observed, spark, "key", "v", "2024-01-01", "2024-01-03", fill_value=None)
    rows = {r.day.day: r.v_filled for r in out.collect()}
    assert rows[1] is None and rows[2] == 7.0 and rows[3] is None


def test_gap_fill_window_is_per_key_not_global(spark):
    """The forward-fill window partitions by key — the physical plan
    must show a hash-partitioned window, not a single-partition one."""
    observed = spark.createDataFrame(
        [("a", datetime.date(2024, 1, 1), 1.0)], "key string, day date, v double"
    )
    out = gap_fill_daily(observed, spark, "key", "v", "2024-01-01", "2024-01-02")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
