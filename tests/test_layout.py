"""Layout-operator tests: partition pruning proof + compaction."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.layout import (
    compact_parquet,
    partition_events_by_day,
)
from data_ingestion_project_spark.plans.explain import formatted_plan


def test_partitioned_write_enables_pruning(spark, tmp_path):
    """A day filter on the partitioned layout must prune at planning
    time: the scan's partition count drops to 1 directory, visible as
    a partition filter in the plan (no data filter needed at all)."""
    out = str(tmp_path / "events_by_day")
    partition_events_by_day(spark, "/root/testdata/sf0.001", out)

    day_dirs = glob.glob(f"{out}/event_day=*")
    assert len(day_dirs) == 30  # one directory per event day

    df = spark.read.parquet(out).filter(F.col("event_day") == "2024-01-15")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "event_day" in plan.split("PartitionFilters")[1][:200]
    assert df.count() > 0


def test_compaction_reduces_file_count(spark, tmp_path):
    """Many tiny files → one rewrite → few right-sized files, data
    byte-identical."""
    path = str(tmp_path / "frag.parquet")
    # simulate micro-batch fragmentation: 64 files for a tiny table
    spark.range(0, 10000).repartition(64).write.parquet(path)
    before = len(glob.glob(f"{path}/*.parquet"))
    assert before >= 64

    total_before = spark.read.parquet(path).agg(F.sum("id")).first()[0]
    n = compact_parquet(spark, path, target_file_mb=256)
    after = len(glob.glob(f"{path}/*.parquet"))
    assert after <= n <= 2  # tiny table → ~1 file
    assert spark.read.parquet(path).agg(F.sum("id")).first()[0] == total_before
