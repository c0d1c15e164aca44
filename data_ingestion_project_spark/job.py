"""Ingestion job orchestration: source → secure transform → upsert →
metrics.

Re-expresses run_ingestion_job (job.py:18-95 in /root/reference) over
the Spark engine. The metrics dict carries the same keys
(job.py:73-79): http_status, retries_used, rows_fetched,
rows_after_dedup, plus the table path (csv_path key name kept for
contract parity even though the native table is parquet).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import SparkSession

from data_ingestion_project_spark.functions.crypto import CryptoKeys
from data_ingestion_project_spark.operators.transforms import transform_users
from data_ingestion_project_spark.operators.upsert import upsert_parquet_table
from data_ingestion_project_spark.sources.users_json import fetch_random_users, users_from_json

KEY_COLUMN = "login.uuid"


def run_ingestion_job(
    spark: SparkSession,
    keys: CryptoKeys,
    table_path: str,
    users: list[dict[str, Any]] | None = None,
    batch_size: int = 10,
    timeout: int = 15,
) -> dict[str, Any]:
    """One ingestion run. ``users=None`` fetches from the live API
    (reference behavior); tests inject a fixture payload instead.
    """
    http_status: int | None = None
    retries_used: int | None = None
    if users is None:
        users, resp = fetch_random_users(results=batch_size, timeout=timeout)
        http_status = resp.status_code
        # defensive getattr chain, mirroring job.py:52-54
        retries = getattr(getattr(resp, "raw", None), "retries", None)
        retries_used = getattr(retries, "total", None)

    df_raw = users_from_json(spark, users)
    rows_fetched = df_raw.count()
    df_secure = transform_users(df_raw, keys)
    _, rows_after_dedup = upsert_parquet_table(spark, df_secure, table_path, key=KEY_COLUMN)

    return {
        "http_status": http_status,
        "retries_used": retries_used,
        "rows_fetched": rows_fetched,
        "rows_after_dedup": rows_after_dedup,
        "csv_path": table_path,
    }
