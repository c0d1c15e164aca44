"""Streaming observability: structured health metrics from a running
query's progress events.

Correct streaming pipelines still rot operationally — watermarks that
silently discard a growing share of late events, state stores that
never stop growing, batches that fall behind the trigger. Spark
already emits all the evidence in ``StreamingQueryProgress``; this
module reduces it to the handful of numbers an operator alerts on,
with the same dict-shaped output the batch job's metrics use
(job.py::run_ingestion_job).

``numRowsDroppedByWatermark`` is the one that finds real bugs: it is
the count of inputs discarded for arriving LATER than the allowed
lateness — a rising value means the watermark is tuned tighter than
the source's actual disorder and the aggregates are silently
undercounting (pinned live in test_streaming.py).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql.streaming import StreamingQuery


def progress_summary(query: StreamingQuery) -> dict[str, Any]:
    """Summarize the LATEST micro-batch of a running query.

    Returns zeros (not None) before the first progress event so
    monitoring loops can poll unconditionally. State metrics aggregate
    across stateful operators; a query with none reports 0.
    """
    p = query.lastProgress
    if not p:
        return {
            "batch_id": -1,
            "num_input_rows": 0,
            "state_rows": 0,
            "dropped_by_watermark": 0,
            "batch_duration_ms": 0,
        }
    state_ops = p.get("stateOperators") or []
    return {
        "batch_id": p.get("batchId", -1),
        "num_input_rows": p.get("numInputRows", 0),
        "state_rows": sum(op.get("numRowsTotal", 0) for op in state_ops),
        "dropped_by_watermark": sum(
            op.get("numRowsDroppedByWatermark", 0) for op in state_ops
        ),
        "batch_duration_ms": (p.get("durationMs") or {}).get("triggerExecution", 0),
    }


def total_dropped_by_watermark(query: StreamingQuery) -> int:
    """Sum of watermark-dropped rows across the query's RETAINED
    progress history (recentProgress keeps the last ~100 batches) —
    the number that should be zero on a healthy pipeline."""
    total = 0
    for p in query.recentProgress or []:
        for op in p.get("stateOperators") or []:
            total += op.get("numRowsDroppedByWatermark", 0)
    return total
