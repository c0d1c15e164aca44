"""Property test: sessionize vs a direct pandas reference over
randomized timelines with duplicate timestamps and gap-boundary hits."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.sessionize import sessionize

BASE = pd.Timestamp("2024-01-01")
GAP = 10  # seconds

rows_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 60)), min_size=1, max_size=20
)


def reference_sessions(rows: list[tuple[int, int]]) -> dict[int, int]:
    """event index → session id, computed sequentially per user."""
    df = pd.DataFrame(
        {
            "user": [u for u, _ in rows],
            "sec": [s for _, s in rows],
            "eid": range(len(rows)),
        }
    ).sort_values(["user", "sec", "eid"])
    out: dict[int, int] = {}
    for user, grp in df.groupby("user"):
        sess, prev = 0, None
        for r in grp.itertuples():
            if prev is None or r.sec - prev > GAP:
                sess += 1
            out[r.eid] = sess
            prev = r.sec
    return out


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=rows_strategy)
def test_sessionize_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(u, (BASE + pd.Timedelta(seconds=s)).to_pydatetime(), i) for i, (u, s) in enumerate(rows)],
        "user int, ts timestamp, eid int",
    )
    got = {
        r["eid"]: r["session_id"]
        for r in sessionize(df, key="user", ts="ts", gap_seconds=GAP,
                            order_tiebreak="eid").collect()
    }
    assert got == reference_sessions(rows)
