"""Winnowing fingerprint tests: the Spark operator vs a direct Python
reference (Schleimer, Wilkerson & Aiken, SIGMOD 2003), plus the
winnowing guarantee — any shared substring of length k + w - 1 yields
at least one shared fingerprint."""

from __future__ import annotations

import hashlib
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.functions.text import winnow_fingerprints


def _py_winnow(text: str, k: int, w: int) -> set[str]:
    s = re.sub(r"\s+", " ", text.strip().lower())
    n_grams = max(len(s) - k + 1, 1)
    grams = [hashlib.md5(s[i : i + k].encode()).hexdigest() for i in range(n_grams)]
    n_wins = max(n_grams - w + 1, 1)
    return {min(grams[j : j + w]) for j in range(n_wins)}


text = st.text(alphabet="ab c", min_size=0, max_size=40)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(text, min_size=1, max_size=5))
def test_winnow_matches_python_reference(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=4, w=3, use_md5=True).collect()
    got: dict[int, set[str]] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, k=4, w=3), f"doc {i}: {t!r}"


def test_winnow_guarantee_shared_substring(spark):
    # Two documents sharing a substring of length k + w - 1 = 11 must
    # share at least one fingerprint (the winnowing guarantee).
    shared = "qwertyuiopz"
    docs = [(0, "aaaa " + shared + " bbbb"), (1, "cccccc" + shared + "dddddd")]
    df = spark.createDataFrame(docs, "doc_id int, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=8, w=4, use_md5=True).collect()
    fps = {0: set(), 1: set()}
    for r in out:
        fps[r["doc_id"]].add(r["fp"])
    assert fps[0] & fps[1], "winnowing guarantee violated: no shared fingerprint"


def test_winnow_short_text_single_window(spark):
    # Text shorter than k still produces exactly one fingerprint.
    df = spark.createDataFrame([(0, "ab")], "doc_id int, text string")
    out = winnow_fingerprints(df, "text", "doc_id", k=8, w=4, use_md5=True).collect()
    assert len(out) == 1
    assert out[0]["fp"] == hashlib.md5(b"ab").hexdigest()
