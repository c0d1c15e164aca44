"""Property test: jaccard_pairs vs direct Python set arithmetic over
random small-alphabet texts (forced collisions, repeated words,
single-word docs)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.dedup import jaccard_pairs

word = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
text = st.lists(word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(text, min_size=2, max_size=6))
def test_jaccard_matches_set_arithmetic(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id int, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"] for r in jaccard_pairs(df).collect()
    }
    sets = {i: set(t.split()) for i, t in enumerate(texts)}
    for i in sets:
        for j in sets:
            if i >= j:
                continue
            inter = len(sets[i] & sets[j])
            if inter == 0:
                assert (i, j) not in got  # non-overlapping pairs never materialize
            else:
                expected = inter / len(sets[i] | sets[j])
                assert abs(got[(i, j)] - expected) < 1e-12


def test_prefix_filter_matches_quadratic_join_exactly(spark):
    """Prefix filtering is EXACT: for several thresholds, the
    (id_a, id_b, jaccard) output must equal the unfiltered
    inverted-index join's output filtered to the same threshold —
    including boundary pairs sitting exactly AT the threshold
    (J = 0.5 pairs planted below)."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.dedup import (
        jaccard_pairs,
        jaccard_pairs_prefix,
    )

    rows = [
        (1, "a b c d"),            # J(1,2) = 3/5
        (2, "a b c e f"),
        (3, "a b c d"),            # exact dup of 1 (J = 1)
        (4, "x y z w"),            # J(4,5) = 2/6 = 1/3 (below 0.5)
        (5, "x y q r"),
        (6, "m n o p"),            # J(6,7) = 2/4... plant an AT-0.5 pair:
        (7, "m n s t"),            # |inter|=2, |union|=6 -> 1/3; adjust:
        (8, "g h i"),              # J(8,9) = 2/4 = 0.5 boundary
        (9, "g h j k"),            # inter {g,h}=2, union 5 -> 0.4; fix below
        (10, "u v"),               # J(10,11)= 1/3
        (11, "u v w2"),            # inter 2, union 3 -> 0.666
        (12, "p1 p2 p3 p4"),       # J(12,13) exactly 0.5: inter 4, union 8
        (13, "p1 p2 p3 p4 q1 q2 q3 q4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8, 1.0):
        want = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in jaccard_pairs(df, min_jaccard=t).collect()
        }
        got = {
            (r["id_a"], r["id_b"]): round(r["jaccard"], 9)
            for r in jaccard_pairs_prefix(df, min_jaccard=t).collect()
        }
        assert got == want, (t, got, want)
    # the planted exactly-at-threshold pair survives at t=0.5
    got05 = {(r["id_a"], r["id_b"]) for r in
             jaccard_pairs_prefix(df, min_jaccard=0.5).collect()}
    assert (12, 13) in got05


def test_prefix_filter_prunes_zipfian_stopword_candidates(spark):
    """The scale property: on a Zipfian corpus where EVERY doc shares
    head stopwords, the naive inverted-index join candidates are the
    full quadratic pair set, while the df-ranked prefix join only
    pairs docs sharing RARE tokens — the planted near-dups."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.dedup import (
        jaccard_prefix_candidates,
        tokenized,
    )

    # 40 docs: all share stopwords {the, of, and}; each has 5 unique
    # rare words; docs 2i/2i+1 for i<3 additionally share their rare
    # tail (the planted near-dups)
    rows = []
    for i in range(40):
        rare = " ".join(f"rare{i}_{j}" for j in range(5))
        if i < 6:
            rare = " ".join(f"dup{i // 2}_{j}" for j in range(5))
        rows.append((i, f"the of and {rare}"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    words = tokenized(df, "text", "doc_id")

    naive = (
        words.alias("a")
        .join(
            words.alias("b"),
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert naive == 40 * 39 // 2  # stopwords pair EVERYTHING

    cand = {
        (r["id_a"], r["id_b"])
        for r in jaccard_prefix_candidates(words, 0.5).collect()
    }
    assert cand == {(0, 1), (2, 3), (4, 5)}  # only the planted near-dups
