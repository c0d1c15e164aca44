"""Guard over the committed scaling-curve record (tools/scaling_sweep.py).

The sweep itself is a ~4-minute 3-SF measurement, run per round and
committed as SCALING.json; this test asserts the RECORD's invariants so
a regression that lands with a super-linear slope cannot merge a green
suite alongside it. The bound is 1.15, not 1.0: the ~0.3 s scheduler
floor distorts small-n points (deflating alpha today), and honest
linear families can show mildly >1 ratios from contention noise — what
the bound must catch is quadratic creep (alpha -> 2), not jitter.
"""

from __future__ import annotations

import json
import os

import pytest

RECORD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.json")


@pytest.mark.skipif(not os.path.exists(RECORD), reason="no committed SCALING.json")
def test_no_super_linear_family_in_committed_sweep():
    rec = json.load(open(RECORD))
    exps = rec["exponents"]
    assert len(exps) >= 15  # the heavy set stays measured, not trimmed
    bad = {q: e["alpha"] for q, e in exps.items() if e["alpha"] > 1.15}
    assert not bad, f"super-linear growth measured: {bad}"
    # the record must cover every family class the verdict named
    drivers = {e["driver_table"] for e in exps.values()}
    assert {"documents", "events", "lineitem"} <= drivers
    # sanity: timings exist for all three scale factors
    for q, t in rec["seconds"].items():
        assert set(t) == {"sf0.001", "sf0.01", "sf0.1"}, q
