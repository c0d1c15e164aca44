"""Scale-utility tests: salting correctness + bucketed join plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.scale import (
    salted_count_by_key,
    salted_join,
    write_bucketed,
)
from data_ingestion_project_spark.plans.explain import executed_plan, plan_census


def test_salted_join_matches_plain_join(spark):
    """Salting must be invisible in results — same rows as a plain join,
    including a hot key holding 90% of the left side."""
    left = spark.createDataFrame(
        [(1, f"l{i}") for i in range(90)] + [(k, f"x{k}") for k in range(2, 12)],
        "k int, lval string",
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(1, 12)], "k int, rval string")
    plain = {(r["k"], r["lval"], r["rval"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["lval"], r["rval"]) for r in salted_join(left, right, "k").collect()}
    assert salted == plain
    assert len(salted) == 100


def test_salted_count_matches_plain_count(spark):
    df = spark.createDataFrame([(1,)] * 1000 + [(2,)] * 3, "k int")
    got = {r["k"]: r["n"] for r in salted_count_by_key(df, "k").collect()}
    assert got == {1: 1000, 2: 3}


def test_co_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the same key/count must join with zero
    exchanges — the layout contract that kills the per-query shuffle of
    fact-fact joins at 100 TB."""
    # warehouse dir is a static conf — bucketed tables land in the
    # default spark-warehouse/ (gitignored), dropped in the finally.
    orders = spark.range(0, 1000).select(
        F.col("id").alias("okey"), (F.col("id") % 7).alias("ostat")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("okey"), F.col("id").alias("item")
    )
    write_bucketed(orders, "t_orders_b", "okey", n_buckets=8)
    write_bucketed(items, "t_items_b", "okey", n_buckets=8)
    joined = spark.table("t_orders_b").join(spark.table("t_items_b"), "okey")
    # disable broadcast so the test exercises the bucketed path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = executed_plan(joined)
        assert "Exchange" not in plan, plan[:500]
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_items_b")
