"""Round-12 isolated query timer: the optimization loop's measuring
stick (guide §1 — measure first, re-measure after every change).

One warm session (same table/asset warmup as bench.py so numbers are
comparable to the protocol), then each named query runs REPS times
back-to-back; the per-query MEDIAN over reps is printed (the bench's
median-over-sweeps rationale at micro scale: a contention spike hits
one rep, the median sheds it).  ``--explain DIR/tag`` additionally
writes ``DIR/<query>_<tag>.txt`` with the formatted plan — the
plans/r12 before/after artifacts.

Usage:
  python tools/qtime_r12.py [--reps N] [--explain DIR/TAG] q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    explain = None
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    if reps < 1:  # r13 (ADVICE): rows is read after the loop — 0 reps
        # would NameError; the tool's contract is "time it", so >= 1
        print("--reps must be >= 1", file=sys.stderr)
        sys.exit(2)
    if "--explain" in args:
        i = args.index("--explain")
        explain = args[i + 1]
        del args[i : i + 2]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from data_ingestion_project_spark.queries import all_queries, warm_derived_assets
    from data_ingestion_project_spark.session import build_session
    from data_ingestion_project_spark.sources.readers import TABLES, table

    spark = build_session("qtime-r12")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    for t in TABLES:
        df = table(spark, sf_dir, t)
        df.select([F.count(F.col(c)).alias(c) for c in df.columns]).collect()
    warm_derived_assets(spark, sf_dir)

    for name in names:
        if explain:
            # r13 (ADVICE): build the DataFrame ONCE for the plan dump
            # (the old branch called qs[name]() twice)
            d, tag = os.path.split(explain)
            os.makedirs(d or ".", exist_ok=True)
            qdf = qs[name](spark, sf_dir)
            plan = qdf._sc._jvm.PythonSQLUtils.explainString(
                qdf._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(d, f"{name}_{tag}.txt"), "w") as f:
                f.write(plan)
        xs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"qtime {name} rep{r}")
            t0 = time.perf_counter()
            rows = qs[name](spark, sf_dir).collect()
            xs.append(round(time.perf_counter() - t0, 3))
        xs_s = sorted(xs)
        med = xs_s[len(xs_s) // 2] if reps % 2 else (xs_s[reps // 2 - 1] + xs_s[reps // 2]) / 2
        print(f"{name}: median {med:.3f}s  reps {xs}  ({len(rows)} rows)")


if __name__ == "__main__":
    main()
