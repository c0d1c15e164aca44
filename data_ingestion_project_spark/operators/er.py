"""Entity resolution: blocking → match → closure → survivorship.

Promoted out of queries/documents.entity_golden_records (round-5
verdict ask #5) so the four stages are reusable operators, and so the
block-size cap the query's docstring promised actually EXISTS in code.

Pipeline shape at 100 TB:
- ``blocking_pairs``: ONE equi-join shuffle on the blocking key. The
  pairwise work inside a block is quadratic, so a hot key (a shared
  digit string, an empty-normalized name) must be REFUSED, not joined:
  ``max_block_size`` drops oversized blocks before the self-join — the
  same degenerate-bucket valve as ``dedup.minhash_band_candidates``
  (``max_bucket_size``), and the same window formulation: the count-
  over-partition window's exchange hash-partitions the rows on exactly
  the self-join's key, so the join REUSES that one exchange (the
  partial-agg + broadcast-anti alternative measured ~25% slower
  end-to-end — rationale at operators/dedup.py:500).
- ``match_pairs``: per-pair fuzzy rescore (levenshtein bound), cheap
  JVM expression over the bounded candidate set.
- ``resolve_clusters``: transitive closure via min-label connected
  components (operators/graph.py — O(diameter) rounds over the
  match-pair-sized edge list, checkpointed).
- ``golden_records``: one aggregation — deterministic survivorship
  (min_by on a priority column) picks the canonical row per entity.

Reference parity: the reference ETL (SURVEY.md header; 418-line pandas
job) has no entity-resolution surface — this is a north-star
training-data-pipeline component (dedup/canonicalization family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def blocking_pairs(
    records: DataFrame,
    id_col: str,
    block_col: str,
    max_block_size: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) within equal blocking keys.

    ``max_block_size`` is the scale valve: blocks holding more rows
    than the cap are dropped BEFORE the self-join (their quadratic
    candidate set would dominate the stage — the classic hot-key
    failure). Production runs always set it; ``None`` keeps the exact
    semantics for oracle replay on corpora known to have tiny blocks.
    Rows with an empty/NULL blocking key never pair (an empty key is
    "no blocking evidence", and at web scale it is also always the
    hottest key)."""
    keyed = records.filter(
        F.col(block_col).isNotNull() & (F.length(block_col) > 0)
    ).select(id_col, block_col)
    if max_block_size is not None:
        wb = Window.partitionBy(block_col)
        keyed = (
            keyed.withColumn("__bs", F.count(F.lit(1)).over(wb))
            .filter(F.col("__bs") <= max_block_size)
            .drop("__bs")
        )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def match_pairs(
    candidates: DataFrame,
    records: DataFrame,
    id_col: str,
    text_col: str,
    max_distance: int = 1,
) -> DataFrame:
    """Fuzzy rescore of candidate pairs: keep pairs whose ``text_col``
    values are within ``max_distance`` edits. Two hash-joins pull the
    texts onto the (bounded) candidate set; the levenshtein bound is a
    codegen'd JVM expression."""
    ta = records.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("__ta")
    )
    tb = records.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("__tb")
    )
    return (
        candidates.join(ta, "id_a")
        .join(tb, "id_b")
        .filter(F.levenshtein("__ta", "__tb") <= max_distance)
        .select("id_a", "id_b")
    )


def resolve_clusters(records: DataFrame, matches: DataFrame, id_col: str) -> DataFrame:
    """Transitive match closure: every record gets a ``cluster`` label
    (the min record id reachable through match edges; singletons label
    themselves). Input ``matches`` is the (id_a, id_b) match-pair edge
    list."""
    from data_ingestion_project_spark.operators.graph import connected_components

    comp = connected_components(matches, src="id_a", dst="id_b").withColumnRenamed(
        "node", id_col
    )
    return records.join(comp, id_col, "left").withColumn(
        "cluster", F.coalesce("comp", F.col(id_col))
    ).drop("comp")


def golden_records(
    clustered: DataFrame,
    id_col: str,
    cluster_col: str = "cluster",
    survivor_cols: dict[str, str] | None = None,
) -> DataFrame:
    """One row per entity cluster: deterministic survivorship — for
    each column in ``survivor_cols`` (alias → source column), take the
    value carried by the cluster's minimum-``id_col`` row (min_by).
    Adds ``cluster_size`` and ``n_names``-style distinct counts are
    left to callers; this operator is the pure survivorship fold."""
    survivor_cols = survivor_cols or {}
    aggs = [F.count(F.lit(1)).alias("cluster_size")] + [
        F.min_by(src, id_col).alias(alias) for alias, src in survivor_cols.items()
    ]
    return clustered.groupBy(cluster_col).agg(*aggs)
