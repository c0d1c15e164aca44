"""Multimodal plumbing tests: binary columns through mapInPandas —
real schema/batch/partitioning, stubbed codecs."""

from __future__ import annotations

import hashlib

import pytest

from data_ingestion_project_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_media_features,
    frame_sample,
    media_summary,
    require_real_decoder,
)


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-1", ("png", 64, 64, None)),
        (2, "image", b"\x89PNG-fake-2", ("png", 32, 32, None)),
        (3, "video", b"RIFF-fake-vid", ("avi", 320, 240, 3500)),
        (4, "audio", b"fLaC-fake", ("flac", None, None, 2000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(3)


def test_feature_extraction_schema_and_determinism(spark, media_df):
    out = extract_media_features(media_df)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 4
    expected_hash = hashlib.sha256(b"\x89PNG-fake-1").hexdigest()
    assert rows[1]["sha256"] == expected_hash
    assert rows[1]["feat_mean"] == hashlib.sha256(b"\x89PNG-fake-1").digest()[0]
    # deterministic across a second run (stable fake decode)
    again = {r["media_id"]: r for r in extract_media_features(media_df).collect()}
    assert rows[1]["feat_entropy"] == again[1]["feat_entropy"]


def test_frame_sample_expands_videos_only(spark, media_df):
    frames = frame_sample(media_df, every_ms=1000).collect()
    assert {f["media_id"] for f in frames} == {3}
    assert [f["frame_ts_ms"] for f in sorted(frames, key=lambda f: f["frame_idx"])] == [
        0,
        1000,
        2000,
        3000,
    ]
    assert all(len(f["frame_payload"]) == 32 for f in frames)


def test_media_summary_prunes_payload(spark, media_df, tmp_path):
    from data_ingestion_project_spark.plans.explain import scan_info

    path = str(tmp_path / "media.parquet")
    media_df.write.parquet(path)
    media = spark.read.parquet(path)
    out = media_summary(media)
    assert {r["kind"]: r["n_media"] for r in out.collect()} == {"image": 2, "video": 1, "audio": 1}
    scans = scan_info(out)
    assert scans, "expected a parquet scan in the plan"
    assert scans[0]["read_schema"].startswith("struct<")  # real schema, not a parse miss
    assert "payload" not in scans[0]["read_schema"]


def test_real_decoder_guard_raises():
    with pytest.raises(NotImplementedError):
        require_real_decoder()
