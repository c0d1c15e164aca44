"""Incremental aggregate maintenance: refresh == full recompute, and
the refresh provably scans only the appended directories."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_ingestion_project_spark.operators import txn_table
from data_ingestion_project_spark.operators.incremental import refresh_agg

KEYS = ["k"]
SPECS = [
    ("v", "sum", "total"),
    ("v", "min", "lo"),
    ("v", "max", "hi"),
    ("v", "count", "n"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _as_map(df):
    return {r.k: (r.total, r.lo, r.hi, r.n) for r in df.collect()}


def _full(spark, path):
    return _as_map(
        txn_table.read(spark, path)
        .groupBy("k")
        .agg(
            F.sum("v").alias("total"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def test_incremental_matches_full_recompute(spark, tmp_path):
    table = str(tmp_path / "t")
    state = str(tmp_path / "s")
    txn_table.create_table(spark, table, _df(spark, [("a", 1), ("a", 2), ("b", 5)]))

    out, info = refresh_agg(spark, table, state, KEYS, SPECS)
    assert info["mode"] == "full"
    assert _as_map(out) == _full(spark, table)

    # append twice; each refresh must scan ONLY the new directory
    txn_table.append(spark, table, _df(spark, [("a", 10), ("c", 7)]))
    out, info = refresh_agg(spark, table, state, KEYS, SPECS)
    assert info == {"mode": "incremental", "scanned_dirs": 1, "version": 1}
    assert _as_map(out) == _full(spark, table)

    txn_table.append(spark, table, _df(spark, [("b", -3)]))
    out, info = refresh_agg(spark, table, state, KEYS, SPECS)
    assert info["mode"] == "incremental" and info["scanned_dirs"] == 1
    assert _as_map(out) == _full(spark, table)

    # no new commits -> no scan at all
    out, info = refresh_agg(spark, table, state, KEYS, SPECS)
    assert info["mode"] == "noop" and info["scanned_dirs"] == 0
    assert _as_map(out) == _full(spark, table)


def test_history_rewrite_falls_back_to_full(spark, tmp_path):
    table = str(tmp_path / "t")
    state = str(tmp_path / "s")
    txn_table.create_table(spark, table, _df(spark, [("a", 1), ("b", 2)]))
    refresh_agg(spark, table, state, KEYS, SPECS)

    # overwrite drops the folded-in directory -> incremental state is
    # unusable and the refresh must say so, not silently merge
    txn_table.overwrite(spark, table, _df(spark, [("z", 100)]))
    out, info = refresh_agg(spark, table, state, KEYS, SPECS)
    assert info["mode"] == "full"
    assert _as_map(out) == _full(spark, table) == {"z": (100, 100, 100, 1)}


def test_expression_columns_and_unmergeable_rejected(spark, tmp_path):
    table = str(tmp_path / "t")
    state = str(tmp_path / "s")
    txn_table.create_table(spark, table, _df(spark, [("a", 3), ("a", 4)]))

    out, _ = refresh_agg(
        spark, table, state, KEYS, [("v * 2", "sum", "double_total")]
    )
    assert out.collect()[0].double_total == 14

    with pytest.raises(ValueError, match="not mergeable"):
        refresh_agg(spark, table, str(tmp_path / "s2"), KEYS, [("v", "avg", "m")])
