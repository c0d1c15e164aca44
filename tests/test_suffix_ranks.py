"""Prefix-doubling suffix ranks (operators/suffix_ranks) and the
exact-substring certification twin (queries/documents.py
exact_substring_census).

The planted-duplicate fixtures are the certification the gram census
cannot give itself: documents constructed with KNOWN longest repeated
runs, checked for the exact max length and the exact per-position
duplicated-8-gram count, plus structural agreement between the suffix
formulation and an independent gram-hash recomputation on the real
corpus."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.suffix_ranks import (
    best_lcp_per_position,
    suffix_rank_tables,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    rows = [(i, langs[i], texts[i].split()) for i in range(len(texts))]
    return spark.createDataFrame(rows, ["doc_id", "lang", "ts"])


def _best(spark, docs, cap=64):
    ranks, meta = suffix_rank_tables(spark, docs, cap=cap)
    best = best_lcp_per_position(spark, ranks, cap=cap)
    return (
        meta.join(best, "pos", "left")
        .withColumn("best_lcp", F.coalesce("best_lcp", F.lit(0)))
        .collect()
    )


def test_planted_cross_doc_repeat_exact_length(spark):
    """Two docs sharing exactly a 13-token run: max best_lcp must be
    exactly 13 — not 12, not 14 — and it must sit at the run starts."""
    run = " ".join(f"tok{i}" for i in range(13))
    texts = [
        f"alpha beta {run} gamma delta epsilon zeta eta theta",
        f"one two three {run} four five six seven eight nine",
    ]
    rows = _best(spark, _docs(spark, texts))
    assert max(r["best_lcp"] for r in rows) == 13


def test_planted_within_doc_repeat(spark):
    """A 9-token run repeated INSIDE one document (boilerplate case)."""
    run = " ".join(f"w{i}" for i in range(9))
    texts = [f"{run} filler0 filler1 filler2 {run} tail0 tail1"]
    rows = _best(spark, _docs(spark, texts))
    assert max(r["best_lcp"] for r in rows) == 9


def test_no_repeats_all_lcp_below_threshold(spark):
    """All-distinct tokens: every best_lcp is 0 (no shared prefix)."""
    texts = [" ".join(f"u{i}" for i in range(30))]
    rows = _best(spark, _docs(spark, texts))
    assert max(r["best_lcp"] for r in rows) == 0


def test_cap_bounds_reported_length(spark):
    """A repeat longer than the cap reports exactly the cap."""
    run = " ".join(f"t{i}" for i in range(40))
    texts = [f"{run} endone", f"{run} endtwo"]
    rows = _best(spark, _docs(spark, texts), cap=32)
    assert max(r["best_lcp"] for r in rows) == 32


def test_dup8_positions_match_gram_recomputation(spark):
    """On the real sf0.001 corpus: positions with best_lcp ≥ 8 (and ≥8
    tokens remaining) must equal, per language, an INDEPENDENT pandas
    8-gram occurrence count — the census-vs-exact agreement floor, and
    it is equality, not a floor: the two formulations are
    mathematically the same predicate."""
    from data_ingestion_project_spark.sources.readers import table

    d = table(spark, SF, "documents")
    docs = d.select(
        "doc_id", "lang", F.split(F.lower(F.trim("text")), r"\s+").alias("ts")
    )
    rows = _best(spark, docs)
    got = {}
    for r in rows:
        if r["n_remaining"] >= 8:
            k = r["lang"]
            n, dup = got.get(k, (0, 0))
            got[k] = (n + 1, dup + (1 if r["best_lcp"] >= 8 else 0))

    pdf = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    grams_per_doc = []
    occ = Counter()
    for _, row in pdf.iterrows():
        ts = row["text"].strip().lower().split()
        gs = [tuple(ts[i : i + 8]) for i in range(len(ts) - 7)]
        grams_per_doc.append((row["lang"], gs))
        occ.update(gs)
    want = {}
    for lang, gs in grams_per_doc:
        n, dup = want.get(lang, (0, 0))
        want[lang] = (n + len(gs), dup + sum(1 for g in gs if occ[g] >= 2))
    assert got == want


def test_exact_census_query_schema_and_sanity(spark):
    from data_ingestion_project_spark.queries.documents import exact_substring_census

    out = exact_substring_census(spark, SF).toPandas()
    assert list(out.columns) == [
        "lang",
        "n_positions",
        "n_dup8",
        "dup_frac",
        "max_repeat_len",
    ]
    assert (out["n_dup8"] <= out["n_positions"]).all()
    assert (out["max_repeat_len"] <= 64).all()
    # the synthetic corpus HAS duplicated runs — a zero here means the
    # detector broke, not that the data got clean
    assert out["n_dup8"].sum() > 0


def test_longest_repeat_extract_planted(spark, tmp_path):
    """The extraction query returns the PLANTED boilerplate string
    itself (the artifact a dedup filter rule needs), with its exact
    length and achiever count."""
    import pandas as pd

    run = " ".join(f"tok{i}" for i in range(11))
    texts = [
        ("en", f"alpha beta {run} gamma delta epsilon zeta eta theta iota"),
        ("en", f"one two three {run} four five six seven eight nine ten"),
        ("fr", "mots distincts sans aucune repetition dans ce document unique entier"),
    ]
    pdf = pd.DataFrame(
        [(i, t, lang, "src0", len(t)) for i, (lang, t) in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)

    from data_ingestion_project_spark.queries.documents import longest_repeat_extract

    out = {r["lang"]: r for r in longest_repeat_extract(spark, str(tmp_path)).collect()}
    assert out["en"]["repeat_len"] == 11
    assert out["en"]["repeat_text"] == run
    assert out["en"]["n_at_max"] == 2  # both planted run-starts achieve it
    assert out["fr"]["repeat_len"] == 0
    assert out["fr"]["repeat_text"] == ""
