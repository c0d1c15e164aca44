"""Keep-first upsert: the reference's persistence operator (U2/D1).

Reference semantics (io_utils.py:16-39 in /root/reference): read the
full table, append the new batch, drop duplicate keys keeping the
FIRST occurrence — because existing rows precede new rows in the
concat, **existing rows win** and re-ingested keys are discarded.

Spark mapping (SURVEY.md §2 D1 decision): NOT ``dropDuplicates``
(keeps an arbitrary row per key — silently diverges). The faithful,
scale-correct form is *insert-if-absent*:

    new_only = new.join(existing, key, "left_anti")
    result   = existing.unionByName(new_only)

which is exactly Delta's ``MERGE WHEN NOT MATCHED THEN INSERT``. The
anti-join broadcasts the small side (a 10-row batch against a huge
table → broadcast the batch; AQE decides from runtime sizes).

At 100 TB the full-table-rewrite pattern of the reference is replaced
by: parquet table + atomic temp-dir swap here; a real deployment
would use a transactional table format (Delta/Iceberg) where this
operator becomes a metadata-only MERGE — the operator API is already
shaped for that swap.
"""

from __future__ import annotations

import os
import shutil
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_keep_first(existing: DataFrame | None, new_rows: DataFrame, key: str) -> DataFrame:
    """Insert-if-absent: existing rows win; new rows deduped on key
    (first occurrence by input order is not defined in a distributed
    setting, so within-batch dedup uses the minimum of a deterministic
    ordering — here any single row per key via dropDuplicates is safe
    ONLY because within one fetched batch keys are unique; cross-batch
    precedence is what matters and is enforced by the anti-join)."""
    kcol = F.col(f"`{key}`")  # backticks: key may be a dotted flat name
    new_rows = new_rows.dropDuplicates([key])
    if existing is None:
        return new_rows
    existing_keys = existing.select(kcol.alias("__existing_key"))
    # No broadcast hint: the anti-join's build side is the EXISTING key
    # set, which grows without bound — forcing it to broadcast would OOM
    # the driver exactly at scale. AQE broadcasts it while it is small
    # and switches to a shuffled anti-join once it isn't; at real scale
    # this whole operator becomes a transactional MERGE (module doc).
    # eqNullSafe: with a plain ==, a null key on both sides compares to
    # NULL -> "not matched" -> the null-key row re-inserts on EVERY run,
    # breaking idempotence. The transform null-gates the key, this is
    # defense in depth for tables written by other producers.
    new_only = new_rows.join(
        existing_keys, kcol.eqNullSafe(F.col("__existing_key")), "left_anti"
    )
    return existing.unionByName(new_only)


def atomic_overwrite_parquet(df: DataFrame, path: str) -> None:
    """Write to a temp dir then swap — readers never observe a PARTIAL
    table (the reference's full-file rewrite has the same all-or-
    nothing contract via to_csv, io_utils.py:37).

    Honesty note on atomicity: with plain directories the swap is two
    renames, and between them the path briefly does not exist — a
    concurrent reader in that microsecond window errors (it never sees
    half a table), and a crash there is recovered below by restoring
    the old directory. True multi-writer/reader atomicity is what
    transactional table formats (Delta/Iceberg) provide; this helper is
    the single-writer stand-in (the ingestion job is single-flight by
    the run_ingestion.sh lock).
    """
    atomic_dir_swap(path, lambda tmp: df.write.mode("overwrite").parquet(tmp))


def atomic_dir_swap(path: str, write_to_tmp) -> None:
    """The uuid-suffixed tmp-write / double-rename / restore-on-failure
    swap shared by every plain-directory overwrite (this module and
    layout.compact_parquet — ONE implementation, so crash-recovery
    fixes cannot drift between call sites). ``write_to_tmp(tmp_path)``
    produces the new directory contents."""
    tmp = f"{path}__tmp_{_uuid.uuid4().hex[:8]}"
    write_to_tmp(tmp)
    old = f"{path}__old_{_uuid.uuid4().hex[:8]}"
    if os.path.exists(path):
        os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        if os.path.exists(old) and not os.path.exists(path):
            os.rename(old, path)  # restore the previous table
        raise
    if os.path.exists(old):
        shutil.rmtree(old)


def read_table_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    if not os.path.exists(path):
        return None
    return spark.read.parquet(path)


def upsert_parquet_table(
    spark: SparkSession, new_rows: DataFrame, path: str, key: str
) -> tuple[DataFrame, int]:
    """Full upsert cycle against a parquet table path.

    Returns (resulting table as a fresh read, row count after dedup).
    The new batch is materialized (cached) before the rewrite so its
    nondeterministic crypto columns are computed exactly once.
    """
    from pyspark.sql import Observation

    new_rows = new_rows.cache()
    new_rows.count()  # materialize through the nondeterministic UDFs
    existing = read_table_if_exists(spark, path)
    merged = upsert_keep_first(existing, new_rows, key)
    # Row count piggybacks on the write via observe (SURVEY.md §2 A1
    # mapping) — no second scan of the table just to count it.
    obs = Observation("upsert_metrics")
    merged = merged.observe(obs, F.count(F.lit(1)).alias("rows"))
    # The merged plan scans the current table; the temp-dir write in
    # atomic_overwrite_parquet executes that scan BEFORE the swap, so
    # no self-overwrite and the data never funnels through the driver.
    atomic_overwrite_parquet(merged, path)
    new_rows.unpersist()
    return spark.read.parquet(path), int(obs.get["rows"])


def upsert_txn_table(
    spark: SparkSession, new_rows: DataFrame, path: str, key: str
) -> tuple[DataFrame, int]:
    """upsert_parquet_table's transactional twin: the same keep-first
    MERGE committed through the transaction log (operators/txn_table)
    — versioned commits, no rename window, conflict detection instead
    of lost updates. The scale path once multiple producers exist."""
    from data_ingestion_project_spark.operators import txn_table as T

    new_rows = new_rows.cache()
    new_rows.count()  # materialize through the nondeterministic UDFs
    if T.current_version(path) is None:
        T.create_table(spark, path, new_rows.dropDuplicates([key]))
    else:
        T.merge_upsert(spark, path, new_rows, key=key)
    new_rows.unpersist()
    # footer-metadata count: no second full-table scan just to report
    # the row count (same posture as upsert_parquet_table's observe)
    return T.read(spark, path), T.table_row_count(path)


def write_csv_parity(df: DataFrame, path: str, columns: tuple[str, ...]) -> None:
    """Single-file CSV export matching the reference's sink
    (io_utils.py:37): header, no index, fixed column order. Parity/
    export mode only — the native table format is parquet."""
    df.select(*[F.col(f"`{c}`") for c in columns]).toPandas().to_csv(path, index=False)
