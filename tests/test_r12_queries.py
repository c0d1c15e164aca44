"""Round-12 pins: the cardinality-gated Breusch–Pagan fold (both
branches must be value-identical), the materialized NB score asset
(asset-served queries must equal the from-scratch recompute), plus
pure-Python replays for any round-12 query additions (the
tests/test_r{N}_queries.py pattern)."""

from __future__ import annotations

import math

import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_project_spark.session import build_session

    s = build_session("test-r12")
    yield s


def test_breusch_pagan_branches_identical(spark, monkeypatch):
    """The grid fold and the per-row fold reduce to the SAME 15 exact
    decimal moments, so every output value must agree bit-for-bit —
    the property that makes the r12 cardinality gate a pure plan
    choice, invisible to the oracle."""
    from data_ingestion_project_spark.queries import all_queries

    q = all_queries()["breusch_pagan_price_quantity"]
    monkeypatch.setenv("SPARK_GRAFT_BP_FORCE", "rows")
    rows_fold = [tuple(r) for r in q(spark, SF0001).collect()]
    monkeypatch.setenv("SPARK_GRAFT_BP_FORCE", "grid")
    grid_fold = [tuple(r) for r in q(spark, SF0001).collect()]
    assert rows_fold == grid_fold
    assert len(rows_fold) == 1 and rows_fold[0][0] > 0


def test_breusch_pagan_gate_picks_rows_at_tiny_sf(spark, monkeypatch):
    """At sf0.001 the (quantity, price) grid is ~as large as the fact
    table (no value-domain saturation), so the gate must choose the
    per-row fold — pin the decision, not just the constant."""
    import data_ingestion_project_spark.queries.stats as stats_mod
    from pyspark.sql import functions as F

    monkeypatch.delenv("SPARK_GRAFT_BP_FORCE", raising=False)
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    nr = li.count()
    ndv = li.select(
        F.approx_count_distinct(
            F.struct(F.col("l_quantity"), F.col("l_extendedprice"))
        ).alias("ndv")
    ).collect()[0]["ndv"]
    assert nr < stats_mod._BP_GRID_AMORT * ndv  # tiny-sf regime


def test_nb_scores_asset_matches_recompute(spark):
    """The materialized nb_scores asset must serve the EXACT frame the
    in-query plumbing used to compute: the asset-served confusion
    matrix (min_by argmax) has to equal nb_confusion run from the raw
    corpus (window argmax) — same scores, same tie-break."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.nb import nb_confusion
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.documents import _nb_scored

    served = sorted(
        tuple(r) for r in all_queries()["nb_lang_confusion"](spark, SF0001).collect()
    )
    d = spark.read.parquet(f"{SF0001}/documents.parquet")
    words = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("word"),
    )
    counts = words.groupBy("doc_id", "lang", "word").agg(F.count(F.lit(1)).alias("c"))
    scratch = sorted(
        (r["true_label"], r["pred_label"], r["n_docs"])
        for r in nb_confusion(counts, label_col="lang").collect()
    )
    assert served == scratch
    # the asset's scores are exact BIGINTs: re-reading must be stable
    sc = _nb_scored(spark, SF0001)
    assert dict(sc.dtypes)["score"] == "bigint"
    assert sc.count() == sc.select("doc_id", "m_label").distinct().count()
