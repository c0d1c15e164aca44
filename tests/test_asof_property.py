"""Property test: asof_join vs pandas.merge_asof as an independent
reference implementation, over randomized event structures (duplicate
timestamps, null payloads, keys with no matches, empty sides)."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.asof import asof_join

BASE = pd.Timestamp("2024-01-01")

# (key, ts_offset_seconds) rows; small domains force collisions
left_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=15
)
right_rows = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50), st.one_of(st.none(), st.integers(0, 99))),
    min_size=0,
    max_size=15,
)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_pandas_merge_asof(spark, lrows, rrows):
    lpdf = pd.DataFrame(
        {
            "k": [k for k, _ in lrows],
            "ts": [BASE + pd.Timedelta(seconds=s) for _, s in lrows],
            "lid": range(len(lrows)),
        }
    )
    rpdf = pd.DataFrame(
        {
            "k": [k for k, _, _ in rrows],
            "rts": [BASE + pd.Timedelta(seconds=s) for _, s, _ in rrows],
            "payload": [p for _, _, p in rrows],
        }
    )
    # dedupe right timestamps per key: with duplicates, "the last right
    # row at ts" is ambiguous and pandas/Spark may legitimately pick
    # different rows — keep the max payload (deterministic choice)
    if len(rpdf):
        rpdf = (
            rpdf.sort_values(["k", "rts", "payload"], na_position="first")
            .groupby(["k", "rts"], as_index=False)
            .last()
        )

    ldf = spark.createDataFrame(lpdf) if len(lpdf) else spark.createDataFrame(
        [], "k bigint, ts timestamp, lid bigint"
    )
    rdf = spark.createDataFrame(rpdf) if len(rpdf) else spark.createDataFrame(
        [], "k bigint, rts timestamp, payload bigint"
    )
    got = {
        r["lid"]: r["payload_asof"]
        for r in asof_join(ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
                           right_payload=["payload"]).collect()
    }

    if len(lpdf) and not len(rpdf):
        expected = {int(lid): None for lid in lpdf["lid"]}
    elif len(lpdf):
        expected_df = pd.merge_asof(
            lpdf.sort_values(["ts", "lid"]),
            rpdf.sort_values("rts") if len(rpdf) else rpdf,
            left_on="ts",
            right_on="rts",
            by="k",
            direction="backward",
            allow_exact_matches=True,
        )
        expected = {
            int(r.lid): (None if pd.isna(r.payload) else int(r.payload))
            for r in expected_df.itertuples()
        }
    else:
        expected = {}
    assert got == expected
