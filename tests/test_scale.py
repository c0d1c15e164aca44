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


def test_aqe_splits_skewed_join_partition(spark):
    """AQE's automatic skew-join split — the runtime complement to the
    manual salting above (the 100x story needs BOTH: salting for skewed
    aggregations and joins AQE can't touch, AQE for skewed sort-merge
    joins it can re-plan on observed shuffle stats).

    One key holds ~99% of the left side, so its hash partition dwarfs
    the median; with the skew thresholds scaled to test data, AQE must
    mark the SortMergeJoin `skew=true` and split the hot partition into
    multiple tasks — asserted on the POST-EXECUTION adaptive plan.
    """
    conf = spark.conf
    keys = [
        ("spark.sql.autoBroadcastJoinThreshold", "-1"),  # force SMJ
        ("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"),
        ("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"),
        ("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"),
        # coalescing would merge the tiny partitions into comparable
        # sizes and mask the skew signal at this scale
        ("spark.sql.adaptive.coalescePartitions.enabled", "false"),
    ]
    saved = {k: conf.get(k, None) for k, _ in keys}
    try:
        for k, v in keys:
            conf.set(k, v)
        left = spark.range(0, 60_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("lval"),
        )
        right = spark.createDataFrame(
            [(7, "hot"), (1, "a"), (2, "b"), (101, "c")], "k int, rval string"
        )
        joined = left.join(right.withColumn("k", F.col("k").cast("long")), "k")
        plan = executed_plan(joined)
        assert "skew=true" in plan, plan
    finally:
        for k, old in saved.items():
            if old is None:
                conf.unset(k)
            else:
                conf.set(k, old)
