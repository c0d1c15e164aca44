"""Unicode hygiene (functions/unicodefn.py): zero-width scrub is a
pure-JVM regexp_replace; NFC normalization is the one Arrow pandas-UDF
step (no Spark builtin).  Pins: scrub removes exactly the four format
characters and nothing else; NFC composes decomposed sequences,
is idempotent, and is null-safe; both stages preserve already-clean
ASCII byte-for-byte."""

from __future__ import annotations

import unicodedata

import pyspark.sql.functions as F

from data_ingestion_project_spark.functions.unicodefn import (
    nfc_normalize,
    scrub_zero_width,
)

ZWSP, ZWNJ, ZWJ, BOM = "​", "‌", "‍", "﻿"
DECOMPOSED = "e\u0301"  # e + COMBINING ACUTE
COMPOSED = "\u00e9"  # precomposed LATIN SMALL LETTER E WITH ACUTE


def _run(spark, rows):
    df = spark.createDataFrame([(r,) for r in rows], ["s"])
    out = df.select(
        scrub_zero_width("s").alias("scrubbed"),
        nfc_normalize(F.col("s")).alias("canon"),
    ).collect()
    return [(r["scrubbed"], r["canon"]) for r in out]


def test_scrub_removes_all_four_format_chars_and_nothing_else(spark):
    dirty = f"{BOM}a{ZWSP}b{ZWNJ}c{ZWJ}d"
    [(scrubbed, _)] = _run(spark, [dirty])
    assert scrubbed == "abcd"
    # a real (rendering) space and a non-breaking space survive
    [(kept, _)] = _run(spark, ["a b c"])
    assert kept == "a b c"


def test_nfc_composes_and_is_idempotent(spark):
    [(_, canon)] = _run(spark, [f"caf{DECOMPOSED}"])
    assert canon == f"caf{COMPOSED}"
    assert unicodedata.is_normalized("NFC", canon)
    [(_, again)] = _run(spark, [canon])
    assert again == canon


def test_both_stages_pass_clean_ascii_and_none_through(spark):
    df = spark.createDataFrame([("plain ascii.",), (None,)], ["s"])
    rows = df.select(
        scrub_zero_width("s").alias("scrubbed"),
        nfc_normalize(F.col("s")).alias("canon"),
    ).collect()
    assert (rows[0]["scrubbed"], rows[0]["canon"]) == ("plain ascii.", "plain ascii.")
    assert rows[1]["scrubbed"] is None and rows[1]["canon"] is None


def test_scrub_then_nfc_dedups_render_identical_docs(spark):
    """The motivating case: byte-different, render-identical docs
    collapse to one fingerprint after scrub+NFC."""
    variants = [
        f"caf{COMPOSED} au lait",
        f"caf{DECOMPOSED} au lait",
        f"{BOM}caf{COMPOSED} au{ZWSP} lait",
    ]
    df = spark.createDataFrame([(v,) for v in variants], ["s"])
    n = (
        df.select(nfc_normalize(scrub_zero_width("s")).alias("c"))
        .agg(F.countDistinct("c").alias("n"))
        .collect()[0]["n"]
    )
    assert n == 1
