"""Table-layout operators: partitioned writes and small-file compaction.

The two layout decisions that dominate read cost at 100 TB:

- **Partition columns** (hive-style ``dt=.../`` directories): queries
  filtering on the partition column read only matching directories —
  partition pruning happens at planning time, before any I/O. Choose
  low-cardinality columns that appear in most predicates (event date,
  region); never high-cardinality keys (one directory per user_id is
  a metadata explosion).

- **File sizing**: streaming/micro-batch ingestion produces many small
  files (one per trigger x partition); each file costs a task + open +
  footer read, so a million 1 MB files can be slower to scan than a
  hundred 10 GB ones. Periodic compaction rewrites partitions into
  ~target-sized files. (Transactional formats do this as OPTIMIZE;
  this is the plain-parquet form.)
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned parquet write (directory per partition value)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def partition_events_by_day(spark: SparkSession, sf_dir: str, out_path: str) -> None:
    """Example layout job: events re-laid-out by event day — the layout
    every time-ranged query wants (a day filter then prunes ~29/30 of
    the data before any scan task launches)."""
    from data_ingestion_project_spark.sources.readers import table

    events = table(spark, sf_dir, "events").withColumn(
        "event_day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(events, out_path, ["event_day"])


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    partition_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet table into ~target-sized files.

    Returns the number of output files. File count is derived from the
    on-disk size (cheap driver-side walk); the rewrite itself is one
    distributed pass. For partitioned tables, pass ``partition_cols``
    so the layout is preserved; compaction then still coalesces within
    each partition directory.
    """
    total_bytes = 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total_bytes += os.path.getsize(os.path.join(root, f))
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))

    df = spark.read.parquet(path)
    # uuid-suffixed scratch dirs (mirrors upsert.atomic_overwrite_parquet):
    # fixed names would collide with leftovers from a previously crashed
    # run and block compaction until manual cleanup.
    run_id = uuid.uuid4().hex[:12]
    tmp = f"{path}__compact_tmp_{run_id}"
    if partition_cols:
        # repartition BY the partition columns: a global round-robin
        # repartition would spread every partition's rows across all
        # tasks and partitionBy would then write up to
        # n_files x n_partitions fragments — worse than no compaction
        writer = df.repartition(n_files, *partition_cols).write.mode("overwrite")
        writer = writer.partitionBy(*partition_cols)
    else:
        writer = df.repartition(n_files).write.mode("overwrite")
    writer.parquet(tmp)

    import shutil

    old = f"{path}__compact_old_{run_id}"
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    except BaseException:
        if not os.path.exists(path):
            os.rename(old, path)
        raise
    shutil.rmtree(old)
    return n_files
