"""Guard over the committed memory-highwater record
(tools/memory_highwater.py) — the memory twin of
tests/test_scaling_record.py (VERDICT r9 ask #1).

The sweep measures every scaling_sweep.HEAVY family at TWO derived
decades (sf1 = 6 M lineitem, sf10 = 60 M) in isolated subprocesses and
fits a memory-vs-rows slope beta per family for both the stage
execution peak (the number a cluster executor budget must hold) and
the whole-JVM high-water. This test pins the record's invariants so a
change that makes a family's memory grow super-linearly cannot merge
with a green suite.

Reading the slopes honestly:
- beta_stage is only MEANINGFUL where the absolute peak clears the
  allocation floor — Spark's task memory manager grants execution
  memory in large quanta, so sub-~2 GB peaks are quantization noise
  and their fitted slopes (some read >1.5 on a 30x jump from 30 MB to
  1 GB) say nothing about asymptotics. The guard therefore bounds
  beta_stage only for families whose sf10 stage peak is >= 4 GB —
  where the measurement is load-bearing.
- beta_jvm includes a multi-GB constant heap baseline, deflating the
  slope for small peaks; it is bounded loosely as a backstop.
"""

from __future__ import annotations

import json
import os

import pytest

RECORD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "MEMORY_HIGHWATER.json",
)

# Families allowed above the stage-slope bound, each with the written
# reason the slope is bounded in practice (mirrors the BASELINE.md r10
# memory notes):
STAGE_SLOPE_EXCEPTIONS: dict[str, str] = {
    # measured 0.30 GB (sf1) -> 4.26 GB (sf10), fitted 1.15: the sf1
    # end sits AT the task-memory allocation floor (sub-GB grants are
    # quantized), inflating the fitted slope. The structural bound is
    # the max_block_size=100 valve: candidate pairs per pigeonhole
    # block are <= B^2 regardless of corpus, block COUNT grows
    # linearly in documents, and per-task state is one block pair —
    # so stage memory is linear-in-docs with a capped constant. The
    # 4.3 GB absolute at 500k docs is the whole-stage sum across 32
    # concurrent tasks, ~130 MB/task.
    "simhash_near_dups": "sf1 end at allocation floor; max_block_size caps per-task state",
}


@pytest.mark.skipif(not os.path.exists(RECORD), reason="no committed record")
def test_memory_record_covers_every_heavy_family_with_bounded_slopes():
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
        ),
    )
    from scaling_sweep import HEAVY

    rec = json.load(open(RECORD))
    fams = rec["families"]

    # coverage: every heavy family appears, measured at both decades
    # (or explicitly marked import-gated-skipped)
    missing = sorted(set(HEAVY) - set(fams))
    assert not missing, f"heavy families absent from memory record: {missing}"
    for name in HEAVY:
        per_sf = fams[name]["per_sf"]
        for lbl in ("sf1", "sf10"):
            got = per_sf.get(lbl)
            assert got, (name, lbl, "decade unmeasured")
            assert "error" not in got, (name, lbl, got.get("error", "")[:200])
            if "skipped" in got:
                continue
            assert got.get("jvm_peak_gb"), (name, lbl)

    # slope bound where the measurement is load-bearing (>= 4 GB
    # absolute stage peak at sf10): memory must grow at most ~linearly
    # in driver rows; 1.1 allows quantization jitter, not quadratic
    bad = {}
    for name, fam in fams.items():
        p10 = fam["per_sf"].get("sf10", {}).get("max_stage_peak_exec_gb") or 0
        beta = fam.get("beta_stage")
        if p10 >= 4 and beta is not None and beta > 1.1:
            if name not in STAGE_SLOPE_EXCEPTIONS:
                bad[name] = (p10, beta)
    assert not bad, f"super-linear stage-memory growth at load-bearing scale: {bad}"

    # JVM backstop: no family's whole-JVM slope may exceed linear
    bad_jvm = {
        name: fam["beta_jvm"]
        for name, fam in fams.items()
        if fam.get("beta_jvm") is not None and fam["beta_jvm"] > 1.1
    }
    assert not bad_jvm, f"super-linear JVM growth: {bad_jvm}"

    # the documented worst case stays the suffix-rank families; if a
    # heavier family appears, BASELINE.md's memory notes are stale
    worst = max(
        (
            (fam["per_sf"].get("sf10", {}).get("max_stage_peak_exec_gb") or 0, name)
            for name, fam in fams.items()
        ),
    )
    assert worst[1] in {"exact_substring_census", "longest_repeat_extract"}, worst


# The ten families SCALING.json times at the sixth decade (sf100,
# 600 M lineitem / 100 M events) — VERDICT r10 ask #3 extends the
# MEMORY record to the same decade and re-fits beta there, because
# sf10→sf100 is the decade where an asymptotic surprise would OOM a
# production node first (the TIME record caught a real alpha=1.49
# defect on exactly this step in r10).
SF100_FAMILIES = (
    "cms_word_freq",
    "hourly_event_stats",
    "kaplan_meier_retention",
    "nb_lang_confusion",
    "pricing_summary",
    "quantile_sketch_rollup",
    "rfm_segments",
    "theil_sen_revenue_trend",
    "token_stats",
    "user_sessions",
)


@pytest.mark.skipif(not os.path.exists(RECORD), reason="no committed record")
def test_sixth_decade_memory_rows_present_and_sublinear():
    rec = json.load(open(RECORD))
    fams = rec["families"]
    assert rec["sf_labels"][-1] == "sf100"
    for name in SF100_FAMILIES:
        fam = fams[name]
        row = fam["per_sf"].get("sf100")
        assert row and "error" not in row, (name, row)
        assert row.get("jvm_peak_gb"), name
        # beta must be re-fitted on the LARGEST decade for these
        assert fam.get("beta_decade") == "sf10->sf100", (
            name,
            fam.get("beta_decade"),
        )
        # sublinear memory growth where the sixth-decade measurement
        # is load-bearing (>= 4 GB absolute at sf100); sub-4 GB peaks
        # sit on the allocation quantum and are bounded by the global
        # beta_jvm backstop instead
        p100 = row.get("max_stage_peak_exec_gb") or 0
        if p100 >= 4:
            assert fam.get("beta_stage") is not None and fam["beta_stage"] <= 1.0, (
                name,
                fam.get("beta_stage"),
            )
        assert fam.get("beta_jvm") is not None and fam["beta_jvm"] <= 1.0, (
            name,
            fam.get("beta_jvm"),
        )
