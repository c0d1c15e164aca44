"""Property-based tests for the keep-first upsert (SURVEY.md §5.3):
idempotence, existing-wins, and the row-count algebra
rows_after = rows_before + |new keys not seen|, over randomized
key/batch structures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.upsert import upsert_keep_first

keys_strategy = st.lists(
    st.integers(min_value=0, max_value=30), min_size=0, max_size=25
)


def _df(spark, ids: list[int], tag: str):
    rows = [(f"k{k}", f"{tag}-{k}") for k in ids]
    return spark.createDataFrame(rows, "uuid string, payload string") if rows else spark.createDataFrame(
        [], "uuid string, payload string"
    )


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(existing_ids=keys_strategy, new_ids=keys_strategy)
def test_upsert_algebra(spark, existing_ids, new_ids):
    existing = _df(spark, sorted(set(existing_ids)), "old")
    new = _df(spark, sorted(set(new_ids)), "new")

    merged = upsert_keep_first(existing, new, "uuid")
    got = {r["uuid"]: r["payload"] for r in merged.collect()}

    exist_set = {f"k{k}" for k in existing_ids}
    new_set = {f"k{k}" for k in new_ids}

    # row-count algebra
    assert len(got) == len(exist_set | new_set)
    # existing wins on every collision
    for k in exist_set:
        assert got[k].startswith("old-")
    # new keys inserted
    for k in new_set - exist_set:
        assert got[k].startswith("new-")

    # idempotence: re-applying the same batch changes nothing
    again = {
        r["uuid"]: r["payload"] for r in upsert_keep_first(merged, new, "uuid").collect()
    }
    assert again == got
