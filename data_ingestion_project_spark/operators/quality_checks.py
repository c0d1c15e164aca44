"""Declarative data-quality constraint checking — the validation layer
an ingestion engine runs before publishing a batch (the reference's
only correctness mechanism is fail-fast HTTP + KeyError on missing
fields, SURVEY.md §5; this is that posture generalized to data).

Three constraint classes, each with the cheapest plan that can verify
it:

- ROW checks (not-null, ranges, regex, cross-column predicates): ALL
  folded into ONE scan — each check is a conditional-count aggregate,
  so adding a check adds a counter, never a pass.
- UNIQUE checks: one partial-agg shuffle on the key, counting keys
  seen more than once (never a self-join).
- REFERENTIAL checks (foreign key ⊆ primary key): a left-anti join
  against the DISTINCT referenced keys; at scale AQE broadcasts the
  key list when it fits, and a bloom-filtered pre-pass covers the
  rest.

Output is one row per check: (check, n_violations, passed) — tiny,
deterministic, and SQL-mirrorable so the whole report oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def row_checks(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """Evaluate named row-level constraints in ONE pass. Each value in
    ``checks`` is the PASS condition; a NULL condition result counts as
    a violation (SQL three-valued logic would otherwise silently skip
    exactly the rows most likely to be broken). An empty input frame
    reports (0, passed=True) per check — COUNT, unlike SUM, never
    returns NULL over zero rows, so an empty batch validates clean
    instead of poisoning downstream all-passed logic with NULLs."""
    if not checks:
        raise ValueError("row_checks needs at least one named constraint")
    aggs = [
        F.count(F.when(cond.isNull() | ~cond, F.lit(1))).alias(f"__c{i}")
        for i, cond in enumerate(checks.values())
    ]
    row = df.agg(*aggs)
    # Column-expression unpivot (explode over structs) — names are
    # DATA here, never interpolated into SQL text, so quotes/backticks
    # in a check name cannot break parsing.
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("check_name"), F.col(f"__c{i}").alias("n_violations")
            )
            for i, name in enumerate(checks)
        ]
    )
    stacked = row.select(F.explode(pairs).alias("p")).select("p.*")
    return stacked.select(
        "check_name", "n_violations", (F.col("n_violations") == 0).alias("passed")
    )


def unique_check(df: DataFrame, key_cols: list[str], name: str | None = None) -> DataFrame:
    """Count key tuples that appear more than once (the violation unit
    is the duplicated KEY, not the extra rows — stable under how many
    copies exist)."""
    name = name or f"unique({','.join(key_cols)})"
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return dups.select(
        F.lit(name).alias("check_name"),
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


def referential_check(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    name: str | None = None,
) -> DataFrame:
    """Count child rows whose non-NULL key has no parent (orphans).
    NULL child keys are not violations — that is what a not-null row
    check is for; SQL FKs treat NULL the same way."""
    name = name or f"fk({child_key}->{parent_key})"
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )
    return orphans.select(
        F.lit(name).alias("check_name"),
        F.col("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    )


def quality_report(*parts: DataFrame) -> DataFrame:
    """Union the check frames into one deterministic report."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")
