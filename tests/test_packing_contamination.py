"""Sequence packing + contamination query invariants.

Value-exactness is certified by the DuckDB oracles at sf0.01/sf0.1;
these tests pin the *semantics* that the oracle comparison can't see:
packing arithmetic consistency, shard independence, and that planted
overlap actually trips the contamination detector.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from data_ingestion_project_spark.queries.documents import (
    benchmark_contamination,
    sequence_packing,
)
from tests.conftest import SF_SMOKE


def test_sequence_packing_arithmetic(spark):
    rows = sequence_packing(spark, SF_SMOKE).collect()
    assert rows, "packing produced no shards"
    B = 2048
    for r in rows:
        # ceil-division consistency between token total and sequence count
        assert r.n_sequences == math.ceil(r.total_tokens / B)
        # fill ratio derived from the same two numbers
        assert abs(r.fill_pct - r.total_tokens / (r.n_sequences * B) * 100) < 0.01
        # a document can only straddle if the shard spans >1 sequence
        if r.n_sequences == 1:
            assert r.n_straddlers == 0
        assert 0 <= r.n_straddlers <= r.n_docs

    # shards partition the corpus: doc counts add up to the table size
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert sum(r.n_docs for r in rows) == d.count()


def test_sequence_packing_deterministic(spark):
    a = sequence_packing(spark, SF_SMOKE).collect()
    b = sequence_packing(spark, SF_SMOKE).collect()
    assert a == b


def test_contamination_counts_bounded_and_planted_overlap_detected(spark):
    rows = benchmark_contamination(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_contaminated <= r.n_train_docs
        expect = round(r.n_contaminated * 100.0 / r.n_train_docs, 2)
        assert abs(r.contaminated_pct - expect) < 0.01
    # the benchmark source itself is excluded from the training side
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    n_train = d.filter(F.col("source") != "src0").count()
    assert sum(r.n_train_docs for r in rows) == n_train
