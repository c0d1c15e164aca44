"""Targeted re-measurement of named SCALING families (same protocol as
tools/scaling_sweep.py — warmed tables + assets, wall clock of
plan+execute+collect) on the big decades only, patching the committed
SCALING.json in place and refitting the patched families' exponents.

Use when a full-sweep pass measured a family under ambient load (cold
page cache right after a corpus build, concurrent runs) or after a
plan fix: the full record stays intact; only the named rows move, so
the protocol's "re-measure the outliers quiesced" step is a 5-minute
patch instead of a 60-minute sweep.

Usage: python tools/remeasure_families.py sf1,sf10 family [family ...]

r10: also admits the SIXTH decade (scratch/sf100, 600 M lineitem —
tools/make_scaled_corpus.py scratch/sf100 1000): pass "sf100" in the
sf list; the tool records the new decade's table rows into
SCALING.json["rows"] on first sight. Set SPARK_GRAFT_SKIP_ASSET_WARM=1
to skip the derived-asset warm step — ONLY valid when every named
family reads base tables directly (no bm25/minhash/ivf/... asset);
at sf100 building all assets would dominate the pass.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.scaling_sweep import HEAVY, SFS  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sfs = sys.argv[1].split(",")
    names = sys.argv[2:]
    unknown = [n for n in names if n not in HEAVY]
    if unknown:
        raise SystemExit(f"not in HEAVY: {unknown}")

    from pyspark.sql import functions as F

    from data_ingestion_project_spark.queries import all_queries, warm_derived_assets
    from data_ingestion_project_spark.session import build_session
    from data_ingestion_project_spark.sources.readers import TABLES, table

    spark = build_session("remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    rec_path = os.path.join(_REPO, "SCALING.json")
    rec = json.load(open(rec_path))

    def sf_dir(sf: str) -> str:
        if sf in SFS:
            return os.path.join(
                os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), sf
            )
        return os.environ.get(
            f"SPARK_GRAFT_{sf.upper()}_DIR", os.path.join(_REPO, "scratch", sf)
        )

    for sf in sfs:
        d = sf_dir(sf)
        for t in TABLES:
            df = table(spark, d, t)
            df.select([F.count(F.col(c)).alias(c) for c in df.columns]).collect()
        if os.environ.get("SPARK_GRAFT_SKIP_ASSET_WARM") != "1":
            warm_derived_assets(spark, d)
        if sf not in rec["rows"]:
            rec["rows"][sf] = {
                t: table(spark, d, t).count()
                for t in {"documents", "events", "lineitem", "supplier",
                          "embeddings", "orders", "customer"}
            }
        for name in names:
            t0 = time.perf_counter()
            n = len(queries[name](spark, d).collect())
            took = round(time.perf_counter() - t0, 3)
            # setdefault: also admits families NEW to the record (first
            # measured here rather than by a full sweep pass)
            rec["seconds"].setdefault(name, {})[sf] = took
            print(f"# {sf} {name}: {took:.3f}s ({n} rows)", file=sys.stderr)

    # refit the patched families' exponents with the sweep's rule:
    # last decade where the driving table grows and both ends measured
    labels = list(SFS) + ["sf1", "sf10", "sf100"]
    for name in names:
        drv = HEAVY[name]
        t = rec["seconds"][name]
        fit = [
            (a, b)
            for a, b in zip(labels, labels[1:])
            if a in t and b in t and rec["rows"][b][drv] > rec["rows"][a][drv]
        ]
        if not fit:
            # single measured decade (first-time entry at one sf): keep the
            # seconds we just wrote, skip the exponent refit for this family
            print(f"{name}: <2 growing decades measured, exponent refit skipped")
            continue
        a, b = fit[-1]
        n_ratio = rec["rows"][b][drv] / rec["rows"][a][drv]
        t_ratio = t[b] / t[a]
        rec["exponents"][name] = {
            "driver_table": drv,
            "step": f"{a}->{b}",
            "rows_ratio": round(n_ratio, 3),
            "time_ratio": round(t_ratio, 3),
            "alpha": round(math.log(t_ratio) / math.log(n_ratio), 3),
        }
        print(f"{name}: alpha={rec['exponents'][name]['alpha']}")

    with open(rec_path, "w") as f:
        json.dump(rec, f, indent=1, sort_keys=True)
        f.write("\n")


if __name__ == "__main__":
    main()
