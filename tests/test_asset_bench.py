"""Guards over the committed ingest-cost records.

ASSET_BENCH.json (tools/asset_bench.py, VERDICT r10 ask #1) prices
every materialized-asset BUILD — the cost a 100 TB user pays before
any query — per derived decade with fitted slopes, and
SUFFIX_MITIGATION.json (ask #4) pins the suffix-rank census's
measured per-node budget law.  These tests keep the committed JSON,
the tool's asset registry, and the BASELINE.md prose from drifting
apart — the same pattern as tests/test_scaling_record.py and
tests/test_memory_record.py.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET_RECORD = os.path.join(REPO, "ASSET_BENCH.json")
SUFFIX_RECORD = os.path.join(REPO, "SUFFIX_MITIGATION.json")


@pytest.mark.skipif(not os.path.exists(ASSET_RECORD), reason="no committed record")
def test_asset_bench_covers_registry_with_bounded_slopes():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from asset_bench import ASSETS

    rec = json.load(open(ASSET_RECORD))
    assets = rec["assets"]

    # coverage: every registered asset priced at both decades
    missing = sorted(set(ASSETS) - set(assets))
    assert not missing, f"assets absent from ingest-cost record: {missing}"
    for name in ASSETS:
        per_sf = assets[name]["per_sf"]
        for lbl in ("sf1", "sf10"):
            row = per_sf.get(lbl)
            assert row and "error" not in row, (name, lbl, row)
            assert row.get("seconds") is not None, (name, lbl)
            assert row.get("src_rows"), (name, lbl)
        # disk assets must record their published size; bpe_merges is
        # the documented in-memory exception
        if ASSETS[name][2]:
            assert per_sf["sf10"].get("disk_bytes"), name

    # build time must scale at most ~linearly in source rows across
    # the measured decade (1.15 allows scheduler-floor jitter on cheap
    # builds, same bound and rationale as the query-time record)
    bad = {
        name: a["alpha_time"]
        for name, a in assets.items()
        if a.get("alpha_time") is not None and a["alpha_time"] > 1.15
    }
    assert not bad, f"super-linear asset-build growth: {bad}"

    # memory backstop: no build's whole-JVM slope may exceed linear
    bad_jvm = {
        name: a["beta_jvm"]
        for name, a in assets.items()
        if a.get("beta_jvm") is not None and a["beta_jvm"] > 1.1
    }
    assert not bad_jvm, f"super-linear asset-build JVM growth: {bad_jvm}"


@pytest.mark.skipif(not os.path.exists(SUFFIX_RECORD), reason="no committed record")
def test_suffix_mitigation_record_pins_the_budget_law():
    rec = json.load(open(SUFFIX_RECORD))
    by_label = {c["label"]: c for c in rec["configs"]}

    base = by_label["protocol baseline"]
    assert base["outcome"] == "completes"
    assert base["jvm_peak_gb"] > 45  # the documented 48g/32-thread peak

    # the load-bearing demonstration: half the heap, quarter the
    # concurrency, same width -> completes in ~half the memory with no
    # spill; this is what makes "needs a cluster" a budget formula
    # instead of prose
    mit = by_label["half heap, quarter concurrency"]
    assert mit["outcome"] == "completes"
    assert mit["jvm_peak_gb"] < 0.6 * base["jvm_peak_gb"]
    assert mit["total_disk_spilled_gb"] == 0.0
    # and wall-clock stays within 1.5x of the protocol run
    assert mit["seconds"] < 1.5 * base["seconds"]

    # the negative control that pins concurrency (not width, not total
    # data) as the driver: same heap as the mitigated run but full
    # concurrency OOMs
    oom = by_label["half heap, full concurrency"]
    assert "OOM" in oom["outcome"]

    assert "budget_formula" in rec and "concurrent_tasks" in rec["budget_formula"]
