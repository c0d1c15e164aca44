"""Compare two bench JSON records per query.

    python tools/bench_diff.py OLD.json NEW.json [--threshold 0.2]

Prints added/removed queries and every shared query whose timing
drifted more than ``threshold`` (relative), slowest drifts first, plus
shared-set totals. Round-over-round comparison must be per-query —
totals mix inventory growth with machine contention (BASELINE.md) —
and this makes the committed BENCH_LOCAL.json records directly
diffable.

Exit code: 0 always (informational tool; regressions are judged by a
human against the recorded variance band, not a hard gate).
"""

from __future__ import annotations

import argparse
import json


def diff(old: dict, new: dict, threshold: float) -> dict:
    oq, nq = old.get("queries"), new.get("queries")
    # Fail LOUDLY on shape mismatch: the driver's BENCH_r{N}.json
    # records are {n, rc, tail, ...} with timings buried in a stdout
    # tail string — silently treating them as an empty query map would
    # print an all-added/zero-shared "comparison" that looks like a
    # clean bill of health. Only bench.py's own records
    # (BENCH_LOCAL.json shape) are comparable.
    if not isinstance(oq, dict) or not isinstance(nq, dict):
        raise SystemExit(
            "input lacks a 'queries' map — pass bench.py records "
            "(BENCH_LOCAL.json shape), not driver BENCH_r{N}.json tail captures"
        )
    shared = sorted(set(oq) & set(nq))
    # r11 protocol: multi-pass records carry per-query 'spread'
    # (max−min across sweeps). A delta smaller than the larger of the
    # two queries' own recorded spreads is inside measurement noise
    # and is NOT a drift — this replaces the manual contention-band
    # adjudication the single-pass records needed.
    osp, nsp = old.get("spread") or {}, new.get("spread") or {}
    drifts = []
    for name in shared:
        a, b = oq[name], nq[name]
        if a <= 0:
            continue
        rel = (b - a) / a
        noise = max(osp.get(name, 0.0), nsp.get(name, 0.0))
        if abs(rel) > threshold and abs(b - a) > noise:
            drifts.append(
                {
                    "query": name,
                    "old": a,
                    "new": b,
                    "rel": round(rel, 3),
                    "noise_band": round(noise, 3),
                }
            )
    drifts.sort(key=lambda d: -abs(d["rel"]))
    return {
        "added": sorted(set(nq) - set(oq)),
        "removed": sorted(set(oq) - set(nq)),
        "n_shared": len(shared),
        "shared_total_old": round(sum(oq[n] for n in shared), 3),
        "shared_total_new": round(sum(nq[n] for n in shared), 3),
        "drifts": drifts,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=0.2)
    args = ap.parse_args()
    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)
    d = diff(old, new, args.threshold)
    print(json.dumps(d, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
