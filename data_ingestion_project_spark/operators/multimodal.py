"""Multimodal (image/audio/video) columns: opaque binary + typed
metadata, processed via Arrow-batched ``mapInPandas``.

Design (north-star requirement): media payloads are ``binary`` columns
riding next to typed metadata structs — Spark shuffles/stores them as
bytes without interpretation, so partitioning, predicate pushdown on
metadata, and columnar I/O all behave normally at 100 TB. Compute that
must crack the bytes open (decode, resize, feature-extract,
frame-sample) runs as ``mapInPandas`` generators: Arrow delivers each
partition as pandas batches, the UDF emits transformed batches, and
nothing ever funnels through the driver.

The actual codec calls are STUBBED in this environment (no
PIL/ffmpeg/soundfile in the container): ``decode_fn=None`` selects a
clearly-marked deterministic fake (content-hash-seeded) so the
Spark-side plumbing — schema, batch iteration, partitioning — is real
and tested; production injects a real decoder with the same
``bytes -> dict`` contract, or raises NotImplementedError via
``require_real_decoder()``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha256", StringType()),
        StructField("feat_mean", IntegerType()),   # fake "pixel mean"
        StructField("feat_entropy", IntegerType()),
    ]
)


def require_real_decoder() -> None:
    """Production guard: call before using a real codec path."""
    raise NotImplementedError(
        "No media codec libraries in this environment; inject decode_fn "
        "with a real implementation (bytes -> dict of features)."
    )


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a codec: features derived from a
    content hash — stable across runs/executors, no codec needed."""
    h = hashlib.sha256(payload).digest()
    return {"feat_mean": h[0], "feat_entropy": h[1]}


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Per-payload feature extraction via mapInPandas (Arrow batches).

    Only (media_id, kind, payload) are read — column pruning drops the
    meta struct at the scan if the caller selects from parquet."""
    decode = decode_fn or _fake_decode

    fast_stub = decode_fn is None

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            if fast_stub:
                # Stub path: one sha256 object per payload serves both
                # the content-address column and the fake features —
                # hashing is the hot loop, so never hash twice.
                hs = [hashlib.sha256(b) for b in payloads]
                digests = [h.digest() for h in hs]
                hexes = [h.hexdigest() for h in hs]
                feat_mean = [d[0] for d in digests]
                feat_entropy = [d[1] for d in digests]
            else:
                feats = [decode(b) for b in payloads]
                hexes = [hashlib.sha256(b).hexdigest() for b in payloads]
                feat_mean = [f["feat_mean"] for f in feats]
                feat_entropy = [f["feat_entropy"] for f in feats]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "sha256": hexes,
                    "feat_mean": pd.Series(feat_mean, index=pdf.index, dtype="int32"),
                    "feat_entropy": pd.Series(feat_entropy, index=pdf.index, dtype="int32"),
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _extract, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample(
    media: DataFrame,
    every_ms: int = 1000,
    decode_fn: Callable[[bytes], dict[str, Any]] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Row-expanding mapInPandas (1 video → N frames) — the output batch
    need not align 1:1 with input rows, which is exactly why this is
    mapInPandas and not a scalar UDF. Frame decode is stubbed: frame
    payloads are content-hash slices standing in for JPEG frames."""

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for _, r in pdf.iterrows():
                if r["kind"] != "video":
                    continue
                duration = int(r["duration_ms"]) if pd.notna(r["duration_ms"]) else 0
                for i, ts in enumerate(range(0, duration, every_ms)):
                    fake_frame = hashlib.sha256(
                        bytes(r["payload"]) + ts.to_bytes(4, "big")
                    ).digest()
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_ts_ms": ts,
                            "frame_payload": fake_frame,
                        }
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_payload"])

    flat = media.select(
        "media_id", "kind", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return flat.mapInPandas(_sample, schema=out_schema)


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — reads kind + meta, never the payload
    bytes, so the parquet scan prunes the heavy column entirely
    (verify with plans.scan_info: payload absent from ReadSchema).
    Byte sizes belong in a metadata column at write time for exactly
    this reason."""
    return (
        media.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.avg("meta.width").alias("avg_width"),
            F.max("meta.duration_ms").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )
