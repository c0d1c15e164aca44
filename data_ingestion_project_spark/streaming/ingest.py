"""Streaming ingestion: file-source micro-batches → secure transform →
keep-first upsert per batch.

``foreachBatch`` reuses the *batch* upsert operator verbatim — the
semantics (existing-wins, idempotent re-delivery) are exactly what a
streaming sink needs for exactly-once-per-key behavior even under
at-least-once delivery: a replayed micro-batch is a no-op because its
keys already exist. This is the Structured Streaming equivalent of the
reference's cron loop, with checkpointing replacing the shell lock.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from data_ingestion_project_spark.functions.crypto import CryptoKeys
from data_ingestion_project_spark.operators.transforms import transform_users
from data_ingestion_project_spark.operators.upsert import upsert_parquet_table
from data_ingestion_project_spark.schemas import RAW_USER_SCHEMA


def stream_users_from_json_dir(spark: SparkSession, input_dir: str) -> DataFrame:
    """File streaming source: each JSON file dropped into ``input_dir``
    becomes a micro-batch (the continuous version of one cron run)."""
    return (
        spark.readStream.schema(RAW_USER_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(input_dir)
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first row per key, with state
    bounded by the watermark (``dropDuplicatesWithinWatermark``) — the
    streaming twin of ``operators.dedup.exact_dedup``. Duplicates
    arriving within the watermark horizon are dropped; state for a key
    is evicted once the watermark passes it, so memory is bounded by
    the horizon's key cardinality, not the stream's lifetime (the
    plain ``dropDuplicates`` on a stream grows state forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def start_ingestion_stream(
    spark: SparkSession,
    input_dir: str,
    table_path: str,
    checkpoint_dir: str,
    keys: CryptoKeys,
    key_column: str = "login.uuid",
) -> StreamingQuery:
    """Start the continuous ingestion query (availableNow-compatible:
    callers stop it once idle; tests use processAllAvailable)."""
    raw = stream_users_from_json_dir(spark, input_dir)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        secure = transform_users(batch_df, keys)
        upsert_parquet_table(spark, secure, table_path, key=key_column)

    return (
        raw.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
