"""Incremental cross-batch dedup against the persistent fp index."""

from __future__ import annotations

from data_ingestion_project_spark.operators.incremental_dedup import (
    dedup_batch_against_index,
)

DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the late afternoon sun"
)
OTHER = (
    "completely different content about distributed query engines and "
    "columnar storage formats for large scale analytics workloads"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_across_batches(spark, tmp_path):
    idx = str(tmp_path / "fp_index")

    b1 = _docs(spark, [(1, DOC), (2, OTHER)])
    acc, info = dedup_batch_against_index(spark, idx, b1)
    assert info == {"n_batch": 2, "n_dropped_vs_index": 0,
                    "n_dropped_in_batch": 0, "n_accepted": 2}
    assert acc.count() == 2

    # batch 2: a near-copy of doc 1 (one word changed), one fresh doc,
    # and two in-batch copies of the same new text
    near = DOC.replace("lazy", "sleepy")
    fresh = "an entirely novel document with unique words nobody wrote before"
    b2 = _docs(spark, [(10, near), (11, fresh), (12, fresh + " !")])
    acc, info = dedup_batch_against_index(spark, idx, b2)
    got = sorted(r["doc_id"] for r in acc.collect())
    assert got == [11]  # 10 ~ index doc 1; 12 ~ in-batch 11
    assert info["n_dropped_vs_index"] == 1
    assert info["n_dropped_in_batch"] == 1
    assert info["n_accepted"] == 1

    # idempotent replay of batch 2: everything now matches the index
    acc, info = dedup_batch_against_index(spark, idx, b2)
    assert info["n_accepted"] == 0
