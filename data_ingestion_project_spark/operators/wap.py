"""Write-Audit-Publish: gated ingestion over the transactional table.

The lakehouse pattern (Iceberg WAP branches / Delta staging tables)
composed from this repo's own parts: ``txn_table.stage`` writes the
batch as an UNCOMMITTED data directory, ``quality_checks.row_checks``
audits the staged FILES (what would actually publish — not the
caller's in-memory frame, which can differ after parquet round-trip,
e.g. NaN/precision/timezone normalization), and only a clean audit
triggers ``txn_table.publish_staged`` — a metadata-only commit, so
the publish step is O(1) regardless of batch size.

Failure posture: a failed audit leaves the table bit-identical to
before (readers never saw the batch) and leaves the staged directory
on disk for debugging; ``txn_table.vacuum`` reclaims it after the
in-flight grace window like any orphan. Crash between stage and
publish = same orphan story — the pattern is idempotently re-runnable
because nothing observable happens until the final O_EXCL manifest
commit.

At 100 TB this is the shape that matters: the audit is a full
distributed scan of ONLY the new batch, the publish adds one
directory name to a manifest, and a bad batch costs zero rewrites of
the existing table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession

from data_ingestion_project_spark.operators import txn_table
from data_ingestion_project_spark.operators.quality_checks import row_checks


def audit_staged(
    spark: SparkSession, table_path: str, rel: str, checks: dict[str, Column]
):
    """Audit one staged directory: run the declared row checks against
    the staged FILES in a single scan (row count piggybacked via
    observe). Returns (violations, n_rows, schema) — shared by the
    batch write_audit_publish and the streaming gated-ingestion sink;
    the schema rides along so the publish step never re-opens the
    staged footers."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    staged = txn_table.read_staged(spark, table_path, rel)
    obs = Observation()
    audit = row_checks(
        staged.observe(obs, F.count(F.lit(1)).alias("n")), checks
    ).collect()
    violations = {r["check_name"]: r["n_violations"] for r in audit if not r["passed"]}
    return violations, int(obs.get["n"]), staged.schema


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    table_path: str,
    checks: dict[str, Column],
    merge_schema: bool = False,
) -> dict:
    """Stage ``df``, audit it with named row constraints, publish only
    if every check passes.

    Returns a metrics dict:
    ``{published, version, staged_dir, n_rows, violations}`` where
    ``violations`` maps failed check names to violation counts (empty
    on success) and ``version`` is the committed table version (None
    when the audit failed).
    """
    rel = txn_table.stage(spark, table_path, df)
    violations, n_rows, staged_schema = audit_staged(spark, table_path, rel, checks)
    if violations:
        return {
            "published": False,
            "version": None,
            "staged_dir": rel,
            "n_rows": n_rows,
            "violations": violations,
        }
    version = txn_table.publish_staged(
        spark, table_path, rel, merge_schema=merge_schema, schema=staged_schema
    )
    return {
        "published": True,
        "version": version,
        "staged_dir": rel,
        "n_rows": n_rows,
        "violations": {},
    }
