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


def test_smalldict_mask_path_equals_inverted_index_path(spark):
    """The r12 dictionary-gated bitmask plan must be value-identical
    to the inverted-index pair join it replaces on tiny-dictionary
    corpora — top-k pairs AND the whole threshold operating curve."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_threshold_counts_smalldict,
        jaccard_topk_smalldict,
        small_dict_vocab,
    )

    d = spark.read.parquet(f"{SF0001}/documents.parquet")
    vocab = small_dict_vocab(d)
    assert vocab is not None and len(vocab) <= 64  # this corpus IS tiny-dict
    mask_top = [
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in jaccard_topk_smalldict(d, vocab, k=20).collect()
    ]
    index_top = [
        (r["id_a"], r["id_b"], round(r["jaccard"], 6))
        for r in jaccard_pairs(d, min_jaccard=0.0)
        .orderBy(F.col("jaccard").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(20)
        .collect()
    ]
    assert mask_top == index_top
    thresholds = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    mask_curve = [
        tuple(r)
        for r in jaccard_threshold_counts_smalldict(d, vocab, thresholds).collect()
    ]
    pairs = jaccard_pairs(d, min_jaccard=0.3).localCheckpoint(eager=True)
    index_curve = []
    for t in thresholds:
        hit = pairs.filter(F.col("jaccard") >= t)
        np_ = hit.count()
        nd_ = (
            hit.select(F.explode(F.array("id_a", "id_b")).alias("doc"))
            .distinct()
            .count()
        )
        index_curve.append((t, np_, nd_))
    assert mask_curve == index_curve


def test_neardup_corpus_mode_plants_graded_bands(spark, tmp_path):
    """--neardup planting: per-doc salting zeroes the cross-doc noise
    floor, planted (doc, doc−1) pairs land in graded Jaccard bands,
    row counts and ids are untouched, and near_dup_jaccard_top on the
    planted corpus surfaces exactly the planted structure (via the
    inverted-index branch — the salted vocabulary is large, so the
    smalldict gate must NOT fire)."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.dedup import (
        jaccard_pairs,
        small_dict_vocab,
    )
    from data_ingestion_project_spark.queries import all_queries
    from tools.make_scaled_corpus import build_scaled_corpus

    out = str(tmp_path / "nd")
    import os

    os.environ["SPARK_GRAFT_SRC_SF"] = SF0001  # unused by build fn; explicit src below
    build_scaled_corpus(spark, SF0001, out, 1, neardup=True)
    d = spark.read.parquet(f"{out}/documents.parquet")
    orig = spark.read.parquet(f"{SF0001}/documents.parquet")
    assert d.count() == orig.count()
    assert small_dict_vocab(d) is None  # salted vocabulary ≫ 64
    pairs = jaccard_pairs(d, min_jaccard=0.05).localCheckpoint(eager=True)
    got = pairs.collect()
    assert len(got) > 10
    # every surviving pair is a planted (partner, partner+1) pair —
    # the noise floor is exactly zero
    for r in got:
        assert r["id_b"] == r["id_a"] + 1 and r["id_b"] % 10 == 1, r
    # graded: multiple distinct bands, spanning a wide range
    js = sorted(r["jaccard"] for r in got)
    assert js[0] < 0.55 and js[-1] > 0.85
    assert len({round(j, 1) for j in js}) >= 3
    # the certification query surfaces planted pairs only
    top = all_queries()["near_dup_jaccard_top"](spark, out).collect()
    assert all(r["id_b"] == r["id_a"] + 1 for r in top)
