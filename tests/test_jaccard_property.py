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
