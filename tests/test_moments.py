"""Keyed moment asset (operators/moments.py): incremental fold
equivalence, replay fencing, refit parity with the one-shot
queries/stats.py statistics, and the streaming sink."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_ingestion_project_spark.operators import txn_table as T
from data_ingestion_project_spark.operators.moments import (
    anova_from_asset,
    moment_rows,
    regr_from_asset,
    update_moments_asset,
    welch_from_asset,
)
from data_ingestion_project_spark.sources.readers import table

SF = "/root/testdata/sf0.001"


def _events(spark):
    return table(spark, SF, "events").select("event_id", "event_type", "value")


def test_incremental_fold_equals_one_shot(spark, tmp_path):
    """Folding three disjoint chunks == one-shot moment_rows over the
    full frame, row-for-row exactly (integer moments)."""
    e = _events(spark)
    path = str(tmp_path / "mom")
    for lo, hi in ((0, 700), (700, 1400), (1400, 10**9)):
        chunk = e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi))
        update_moments_asset(spark, path, chunk, "event_type", "value")
    want = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in moment_rows(e, "event_type", "value").collect()
    }
    got = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in T.read(spark, path).collect()
    }
    assert got == want


def test_replayed_fenced_batch_is_noop(spark, tmp_path):
    e = _events(spark)
    path = str(tmp_path / "mom")
    update_moments_asset(spark, path, e, "event_type", "value", fence=("q", 0))
    v = T.current_version(path)
    before = sorted(map(tuple, T.read(spark, path).collect()))
    # at-least-once replay of the same batch id: zero new commits
    update_moments_asset(spark, path, e, "event_type", "value", fence=("q", 0))
    assert T.current_version(path) == v
    assert sorted(map(tuple, T.read(spark, path).collect())) == before


def test_welch_refit_matches_one_shot_query(spark, tmp_path):
    from data_ingestion_project_spark.queries.stats import welch_event_values

    e = _events(spark)
    path = str(tmp_path / "mom")
    for lo, hi in ((0, 1000), (1000, 10**9)):
        update_moments_asset(
            spark,
            path,
            e.filter((F.col("event_id") >= lo) & (F.col("event_id") < hi)),
            "event_type",
            "value",
        )
    got = welch_from_asset(spark, path, "purchase", "click").collect()[0]
    want = welch_event_values(spark, SF).collect()[0]
    assert got["n_a"] == want["n_purchase"] and got["n_b"] == want["n_click"]
    # bit-equal: identical integer moments, identical double arithmetic
    assert got["t_stat"] == want["t_stat"]
    assert got["df_welch"] == want["df_welch"]
    assert got["mean_a"] == want["mean_purchase"]
    assert got["var_b"] == want["var_click"]


def test_anova_refit_matches_one_shot_query(spark, tmp_path):
    from data_ingestion_project_spark.queries.stats import anova_event_values

    e = _events(spark)
    path = str(tmp_path / "mom")
    update_moments_asset(spark, path, e, "event_type", "value")
    got = anova_from_asset(spark, path).collect()[0]
    want = anova_event_values(spark, SF).collect()[0]
    assert got["f_stat"] == want["f_stat"]
    assert got["ss_between"] == want["ss_between"]
    assert got["ss_within"] == want["ss_within"]
    assert got["df_within"] == want["df_within"]


def test_regr_refit_matches_one_shot_query(spark, tmp_path):
    from data_ingestion_project_spark.queries.stats import regr_price_quantity

    li = table(spark, SF, "lineitem")
    path = str(tmp_path / "mom")
    for flag in ("A", "N", "R"):  # per-key batches: keys arrive separately
        update_moments_asset(
            spark,
            path,
            li.filter(F.col("l_returnflag") == flag),
            "l_returnflag",
            "l_quantity",
            y_col="l_extendedprice",
        )
    got = {r["key"]: r for r in regr_from_asset(spark, path).collect()}
    for r in regr_price_quantity(spark, SF).collect():
        g = got[r["l_returnflag"]]
        assert g["n"] == r["n"]
        assert g["slope"] == r["slope"]
        assert g["intercept"] == r["intercept"]
        assert g["r2"] == r["r2"]


def test_moments_stream_equals_batch_fold(spark, tmp_path):
    """Three micro-batches through the fenced sink == one-shot
    moment_rows over the union (exact integer cells)."""
    from data_ingestion_project_spark.streaming.ingest import start_moments_stream

    src = tmp_path / "in"
    src.mkdir()
    table_path = str(tmp_path / "mom")

    def row(i):
        return {"k": ["a", "b", "c"][i % 3], "x": round((i % 37) / 7.0, 4)}

    stream = (
        spark.readStream.schema("k string, x double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = start_moments_stream(
        spark, stream, table_path, str(tmp_path / "ckpt"), key_col="k", x_col="x"
    )
    try:
        for lo, hi, name in ((0, 40, "b1"), (40, 80, "b2"), (80, 120, "b3")):
            (src / f"{name}.json").write_text(
                "\n".join(json.dumps(row(i)) for i in range(lo, hi))
            )
            q.processAllAvailable()
    finally:
        q.stop()

    full = spark.createDataFrame([row(i) for i in range(120)], "k string, x double")
    want = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in moment_rows(full, "k", "x").collect()
    }
    got = {
        r["key"]: (r["n"], r["sx"], r["sxx"])
        for r in T.read(spark, table_path).collect()
    }
    assert got == want
