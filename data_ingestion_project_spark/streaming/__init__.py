"""Structured Streaming twins of the batch operators.

The reference's only streaming is cron-driven micro-batching (one
10-row batch per shell run — run_ingestion_with_metrics.sh:100 in
/root/reference, SURVEY.md §1.1 'Stream' row). In-engine continuous
ingestion is its scale-up path: readStream → transform →
foreachBatch(upsert), plus event-time analytics with watermarks.
"""
