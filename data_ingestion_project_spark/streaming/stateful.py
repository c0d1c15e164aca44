"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-user lifetime totals over an unbounded event stream —
the operator shape that neither windowed aggregation (needs a window)
nor streaming dedup (needs a key) covers: arbitrary user-defined
state evolved per micro-batch.

State design for scale: state is ONE fixed-size row per user
(count + sum), not event history — the store grows with |users|, not
|events|. State lives in the checkpointed state store, partitioned by
the group key, so a 1000-executor cluster shards it naturally. For
keys that must eventually expire (e.g. sessions), swap NoTimeout for
event-time timeouts; lifetime totals deliberately never expire.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame (user_id, value, ...) → per-user lifetime
    totals, emitted in Update mode each micro-batch a user is seen."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
