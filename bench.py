"""Benchmark harness: runs the headline query inventory at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is timed end-to-end (plan build + execution + collect).
Protocol per BASELINE.md: fixed shuffle partitions, crypto in the
low-cost test profile (ingestion microbench included separately).

``--cold`` (VERDICT r6 ask #7): the IO-bound counter-protocol. At
100 TB the engine is parquet-decode-bound, but the warm protocol
above measures compute against OS-page-cached files. Cold mode runs
the heaviest-scan subset with the page cache DROPPED before every
query (sync; echo 3 > /proc/sys/vm/drop_caches — skipped with a
notice where not permitted) and Spark's catalog cache cleared, no
table warmup, and writes a separate BENCH_COLD.json side-record
(override: $SPARK_GRAFT_BENCH_COLD_OUT — deliberately a DIFFERENT
env var from the warm path's $SPARK_GRAFT_BENCH_OUT, so an exported
warm override can never redirect a cold run onto BENCH_LOCAL.json) —
never touching the warm BENCH_LOCAL.json protocol artifact.

Output policy (VERDICT r7 ask #4): the committed BENCH_LOCAL.json is
the QUIESCED protocol artifact. A bare ``python bench.py`` (what the
per-round driver runs, concurrently with whatever else the machine is
doing) writes to the gitignored ``scratch/BENCH_DRIVER.json`` so a
contended driver pass can't clobber the committed record; pass
``--record`` (or set $SPARK_GRAFT_BENCH_OUT) to write the protocol
artifact at round end on a quiet machine.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# the 10 heaviest-scan bench queries (widest byte footprint per table
# family: lineitem / events / documents full-column scans) — the set
# whose COLD numbers bound the parquet-decode floor
COLD_SET = (
    "pricing_summary",
    "nation_market_share",
    "cube_revenue",
    "hourly_event_stats",
    "user_sessions",
    "quantile_sketch_rollup_xx",
    "chisq_event_dow",
    "cms_word_freq",
    "nb_lang_confusion",
    "substring_dup_stats",
)


def _drop_page_cache() -> bool:
    """Best-effort OS page-cache drop; False where not permitted."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def main() -> None:
    cold = "--cold" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:  # cosmetic field — never abort the bench over it
        sf = None

    from data_ingestion_project_spark.queries import bench_queries, warm_derived_assets
    from data_ingestion_project_spark.session import build_session

    spark = build_session("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Isolate JVM/session warmup (executor spin-up, codegen compiler,
    # parquet footer caches, OS page cache) from the first timed query
    # so round-over-round regressions in the heaviest query aren't
    # masked by a 5-8 s startup tax. The warmup decodes every COLUMN of
    # every input table once (count() alone reads only footers, leaving
    # the first lineitem-heavy query to pay the cold column decode).
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.sources.readers import TABLES, table

    if cold:
        # assets must EXIST (they are pipeline outputs, not scan cost)
        # but the page cache is dropped before each timed query below
        t0 = time.perf_counter()
        warm_derived_assets(spark, sf_dir)
        assets = round(time.perf_counter() - t0, 3)
        can_drop = _drop_page_cache()
        if not can_drop:
            print("# WARNING: page-cache drop not permitted; numbers are "
                  "cold-session only", file=sys.stderr)
        timings: dict[str, float] = {}
        qs = bench_queries()
        for name in COLD_SET:
            spark.catalog.clearCache()
            _drop_page_cache()
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            timings[name] = round(time.perf_counter() - t0, 3)
            print(f"# cold {name}: {timings[name]:.3f}s ({len(rows)} rows)",
                  file=sys.stderr)
        total = round(sum(timings.values()), 3)
        result = {
            "metric": "cold_scan_queries_total_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "page_cache_dropped": can_drop,
            "assets_sec": assets,
            "sf": sf,
        }
        out_path = os.environ.get(
            "SPARK_GRAFT_BENCH_COLD_OUT",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_COLD.json"),
        )
        with open(out_path, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)
            f.write("\n")
        print(json.dumps(result))
        return

    t0 = time.perf_counter()
    for t in TABLES:  # warm EVERY table the queries read — a new table
        # missing here would re-absorb the cold-decode tax into its
        # first timed query
        df = table(spark, sf_dir, t)
        # count(col) decodes every column regardless of type (max would
        # reject maps); count(*) would read footers only.
        df.select([F.count(F.col(c)).alias(c) for c in df.columns]).collect()
    warmup = round(time.perf_counter() - t0, 3)
    print(f"# warmup (session + table scans): {warmup:.3f}s", file=sys.stderr)

    # Shared derived assets (events day-layout, winnow fp/pair tables):
    # built once per corpus mtime, reused by every consumer query and
    # across runs. Built here — timed separately — so per-query numbers
    # measure the query against maintained assets (the production
    # posture), not a rebuild of pipeline outputs.
    t0 = time.perf_counter()
    warm_derived_assets(spark, sf_dir)
    assets = round(time.perf_counter() - t0, 3)
    print(f"# derived assets (events layout, winnow fp/pairs): {assets:.3f}s", file=sys.stderr)

    # Round-11 protocol (VERDICT r10 ask #7): the committed record is
    # the per-query MEDIAN over N full sweeps, not a single pass — the
    # shared host's contention band (identical code measured 234-300 s
    # across same-evening passes) made single-pass round-over-round
    # diffs need manual outlier adjudication. Passes are whole-sweep
    # repetitions (not back-to-back per query), so a contention spike
    # hits DIFFERENT queries in different passes and the median sheds
    # it; per-query spread (max-min across passes) is recorded so a
    # diff tool can flag any query whose delta is inside its own noise.
    # Default 1 pass for ad-hoc/driver runs (time budget), 3 for the
    # committed --record artifact; override with --passes N or
    # $SPARK_GRAFT_BENCH_PASSES.
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", 0) or 0)
    if "--passes" in sys.argv[1:]:
        n_passes = int(sys.argv[sys.argv.index("--passes") + 1])
    if n_passes <= 0:
        n_passes = 3 if "--record" in sys.argv[1:] else 1

    all_passes: dict[str, list[float]] = {}
    # FIXED alphabetical run order, decoupled from the certification
    # rotation in queries/__init__: whichever queries run first absorb
    # residual codegen warmup (~+0.3-1 s), so a rotation-dependent
    # order made round-over-round per-query diffs misread reordering
    # as regression (observed r3->r4 on dup_graph_pagerank et al.).
    for p in range(n_passes):
        for name, fn in sorted(bench_queries().items()):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            sec = round(time.perf_counter() - t0, 3)
            all_passes.setdefault(name, []).append(sec)
            print(f"# pass{p + 1} {name}: {sec:.3f}s ({len(rows)} rows)",
                  file=sys.stderr)

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return round(s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2, 3)

    timings = {name: _median(xs) for name, xs in all_passes.items()}
    spread = {name: round(max(xs) - min(xs), 3) for name, xs in all_passes.items()}

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_queries_total_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "warmup_sec": warmup,
        "assets_sec": assets,
        "sf": sf,
        "n_passes": n_passes,
    }
    if n_passes > 1:
        result["passes"] = all_passes
        result["spread"] = spread
    # The driver captures only a stdout TAIL, which truncates the
    # ~100-query JSON line (BENCH_r02/r03 recorded "parsed": null — the
    # tail kept the END of the big line, chopping its opening brace).
    # Persist the full record to a repo file, print it FIRST, and make
    # the LAST stdout line a short summary that always fits the tail.
    repo = os.path.dirname(os.path.abspath(__file__))
    if "--record" in sys.argv[1:]:
        default_out = os.path.join(repo, "BENCH_LOCAL.json")
    else:
        # driver-triggered / ad-hoc run: keep the committed quiesced
        # protocol artifact intact (VERDICT r7 ask #4)
        os.makedirs(os.path.join(repo, "scratch"), exist_ok=True)
        default_out = os.path.join(repo, "scratch", "BENCH_DRIVER.json")
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT", default_out)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
        f.write("\n")
    print(json.dumps(result))
    summary = {
        "metric": result["metric"],
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "warmup_sec": warmup,
        "assets_sec": assets,
        "per_query_sec": round(total / len(timings), 3) if timings else None,
        "n_passes": n_passes,
        "queries_file": os.path.basename(out_path),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
