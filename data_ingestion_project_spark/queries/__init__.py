"""The declared query inventory, exposed to the driver via __spark_entry__.

Each module contributes:
- ``QUERIES``: dict[str, Callable[[SparkSession, str], DataFrame]]
- ``ORACLE``:  dict[str, str]  — DuckDB-equivalent ANSI SQL (omitted for
  genuinely non-SQL-expressible operators → rows-only check)

Conventions that make the duckdb value-hash gate pass:
- every computed column is aliased identically in Spark and SQL;
- aggregate doubles are ROUND()ed (floating-point sums are
  order-dependent; rounding makes them comparison-stable);
- timestamps in outputs are formatted to strings;
- every top-k has a full deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_project_spark.queries import advanced, documents, embeddings, events, tpch, tpch2

_MODULES = (tpch, tpch2, events, documents, embeddings, advanced)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out


# Headline bench set: excludes the deliberately-quadratic exact
# baselines (top_similar_pairs, near_dup_jaccard_top, minhash/simhash
# pair listings) whose cost on this synthetic corpus (tiny shared
# vocabulary → near-cross-join candidate sets) measures the data, not
# the engine. Their scalable twins (LSH variants, fingerprint summary)
# are in.
EXCLUDE_FROM_BENCH = frozenset(
    {
        "top_similar_pairs",
        "near_dup_jaccard_top",
        "minhash_near_dups",
        "simhash_near_dups",
        # recall certifications join against the exact ground truth, so
        # they inherit the quadratic baseline's data-degenerate cost
        "minhash_recall",
    }
)


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v for k, v in all_queries().items() if k not in EXCLUDE_FROM_BENCH}


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
