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


def test_zorder_skips_files_on_both_columns(spark, tmp_path):
    """Z-order vs single-column sort, measured from parquet footers —
    the stats a real scan's skipping consults. Sorting by x alone
    makes every file's y-range span the whole domain (a y predicate
    opens ALL files); the Morton layout bounds both coordinates, so a
    narrow band on EITHER column opens a small fraction of the 32
    files."""
    from data_ingestion_project_spark.operators.layout import (
        files_overlapping,
        parquet_file_ranges,
        write_zordered,
    )
    from pyspark.sql import functions as F

    n = 100_000
    grid = spark.range(n).select(
        (F.xxhash64("id") % 1000).alias("x"),
        (F.xxhash64("id", F.lit(1)) % 1000).alias("y"),
    ).select(F.abs("x").alias("x"), F.abs("y").alias("y"))

    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    write_zordered(grid, zpath, ("x", "y"), n_files=32)
    grid.repartitionByRange(32, "x").sortWithinPartitions("x").write.parquet(xpath)

    zr = parquet_file_ranges(zpath, ["x", "y"])
    xr = parquet_file_ranges(xpath, ["x", "y"])
    assert len(zr) == 32

    # narrow band on y (1% of the domain)
    z_y = files_overlapping(zr, "y", 500, 510)
    x_y = files_overlapping(xr, "y", 500, 510)
    assert x_y == 32                      # x-sorted layout: no y pruning at all
    assert z_y <= 16                      # z-order: most files skipped
    # and x still prunes decently under z-order
    z_x = files_overlapping(zr, "x", 500, 510)
    assert z_x <= 16


def test_zorder_null_handling(spark, tmp_path):
    """All-NULL z column → clear error; sparse NULLs quantize to the
    column min instead of producing a NULL __z placed arbitrarily."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.layout import (
        parquet_file_ranges,
        write_zordered,
    )

    base = spark.range(1000).select(
        F.abs(F.xxhash64("id") % 100).alias("x"),
        F.abs(F.xxhash64("id", F.lit(1)) % 100).alias("y"),
    )

    all_null = base.withColumn("y", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="entirely NULL"):
        write_zordered(all_null, str(tmp_path / "znull"), ("x", "y"), n_files=4)

    sparse = base.withColumn(
        "y", F.when(F.col("id" if "id" in base.columns else "x") % 10 == 0, None).otherwise(F.col("y"))
    )
    p = str(tmp_path / "zsparse")
    write_zordered(sparse, p, ("x", "y"), n_files=4)
    ranges = parquet_file_ranges(p, ["x"])
    # every row landed in some file deterministically
    assert sum(1 for _ in ranges) == 4


def test_write_training_shards_deterministic_layout(spark, tmp_path):
    """Shard dirs cover 0..n-1, assignment matches the portable hash,
    within-shard row order is the deterministic (md5, id) sort, and a
    second write reproduces the identical per-shard sequence."""
    import hashlib

    from data_ingestion_project_spark.operators.layout import write_training_shards

    docs = spark.range(0, 200).selectExpr("id AS doc_id", "CAST(id * 7 AS STRING) AS text")

    def _dump(p):
        write_training_shards(docs, str(p), n_shards=4)
        out = {}
        for s in range(4):
            part = spark.read.parquet(f"{p}/shard={s}")
            out[s] = [r["doc_id"] for r in part.collect()]
        return out

    a = _dump(tmp_path / "a")
    b = _dump(tmp_path / "b")
    assert a == b  # bit-stable layout across writes
    seen = [i for ids in a.values() for i in ids]
    assert sorted(seen) == list(range(200))  # partition of the corpus
    for s, ids in a.items():
        for i in ids:
            h = hashlib.md5(str(i).encode()).hexdigest()
            assert int(h[:6], 16) % 4 == s  # portable-hash agreement
        assert ids == sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))


def test_backfill_rewrites_only_touched_partitions(spark, tmp_path):
    """Dynamic-partition backfill: the corrected day is replaced, every
    other day's files stay byte-identical, and re-running the same
    backfill is a no-op on the data."""
    import os

    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.layout import (
        backfill_partitions,
        write_partitioned,
    )

    days = ["2024-01-01", "2024-01-02", "2024-01-03"]
    df = spark.createDataFrame(
        [(i, days[i % 3], float(i)) for i in range(30)],
        "event_id long, event_day string, value double",
    )
    path = str(tmp_path / "layout")
    write_partitioned(df, path, ["event_day"])

    def _files(day):
        d = os.path.join(path, f"event_day={day}")
        return {
            f: os.path.getmtime(os.path.join(d, f))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        }

    before_d1, before_d3 = _files(days[0]), _files(days[2])
    corrected = df.filter(F.col("event_day") == days[1]).withColumn(
        "value", F.col("value") * 100
    )
    touched = backfill_partitions(spark, corrected, path, "event_day")
    assert touched == [days[1]]
    assert _files(days[0]) == before_d1  # untouched partitions identical
    assert _files(days[2]) == before_d3
    out = spark.read.parquet(path)
    assert out.count() == 30
    d2_vals = {r["value"] for r in out.filter(F.col("event_day") == days[1]).collect()}
    assert all(v >= 100 for v in d2_vals)  # corrected values landed

    again = backfill_partitions(spark, corrected, path, "event_day")
    assert again == [days[1]]
    out2 = spark.read.parquet(path)
    assert out2.count() == 30  # idempotent restatement


def test_backfill_rejects_drifted_schema(spark, tmp_path):
    """A corrections frame whose schema drifted from the existing
    layout (missing / renamed / retyped column) must be rejected before
    any write — mixed-schema partition directories break later
    full-table reads."""
    import pytest
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.layout import (
        backfill_partitions,
        write_partitioned,
    )

    df = spark.createDataFrame(
        [(i, "2024-01-0%d" % (1 + i % 2), float(i)) for i in range(10)],
        "event_id long, event_day string, value double",
    )
    path = str(tmp_path / "layout")
    write_partitioned(df, path, ["event_day"])

    # renamed column
    with pytest.raises(ValueError, match="schema drifted"):
        backfill_partitions(
            spark, df.withColumnRenamed("value", "val"), path, "event_day"
        )
    # retyped column
    with pytest.raises(ValueError, match="retyped"):
        backfill_partitions(
            spark,
            df.withColumn("value", F.col("value").cast("string")),
            path,
            "event_day",
        )
    # missing partition column
    with pytest.raises(ValueError, match="lacks partition column"):
        backfill_partitions(spark, df.drop("event_day"), path, "event_day")
    # healthy frame still passes (guard has no false positive)
    touched = backfill_partitions(
        spark, df.filter(F.col("event_day") == "2024-01-01"), path, "event_day"
    )
    assert touched == ["2024-01-01"]
