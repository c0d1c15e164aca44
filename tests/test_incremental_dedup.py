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

    # idempotent replay of batch 2 (crash after append, before the
    # caller persisted `accepted`): the vs-index join ignores each
    # doc's OWN fingerprints, so the replay reproduces the original
    # accepted set instead of dropping doc 11 against itself...
    from data_ingestion_project_spark.operators import txn_table as T

    fp_rows_before = T.read(spark, idx).count()
    acc, info = dedup_batch_against_index(spark, idx, b2)
    assert sorted(r["doc_id"] for r in acc.collect()) == [11]
    # the per-category counts must ALSO replay identically: doc 12's
    # fps are now in the index, but it stays classified as the in-batch
    # drop it originally was (in-batch-priority tagging)
    assert info == {"n_batch": 3, "n_dropped_vs_index": 1,
                    "n_dropped_in_batch": 1, "n_accepted": 1}
    # ...and already-indexed doc_ids are not re-appended: the index is
    # row-identical after the replay.
    assert T.read(spark, idx).count() == fp_rows_before


def test_first_batch_create_race_rebases(spark, tmp_path, monkeypatch):
    """Two processors race the index create: the loser must rebase onto
    the winner's table (re-running its vs-index pass) instead of dying
    with FileExistsError."""
    from data_ingestion_project_spark.operators import incremental_dedup as mod

    idx = str(tmp_path / "race_index")
    # the "winner" commits first
    dedup_batch_against_index(spark, idx, _docs(spark, [(1, DOC)]))

    # the "loser" saw index_exists=False before the winner's commit:
    # simulate by making its first existence check stale
    real = mod.T.current_version
    calls = {"n": 0}

    def stale_once(path):
        calls["n"] += 1
        return None if calls["n"] == 1 else real(path)

    monkeypatch.setattr(mod.T, "current_version", stale_once)
    near = DOC.replace("lazy", "sleepy")
    acc, info = dedup_batch_against_index(
        spark, idx, _docs(spark, [(2, near), (3, OTHER.replace("columnar", "vectorized"))])
    )
    # rebase deduplicated against the winner's docs: 2 ~ winner's 1
    assert sorted(r["doc_id"] for r in acc.collect()) == [3]
    assert info["n_dropped_vs_index"] == 1 and info["n_accepted"] == 1
