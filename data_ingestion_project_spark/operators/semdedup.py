"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023): cluster the embeddings with a coarse
k-means, then look for near-duplicate PAIRS only inside each cluster,
keeping one representative per duplicate group.

Why this shape survives 100 TB: the quadratic step is confined to one
cluster at a time — k clusters cut the pairwise work by ~k (and the
paper runs k in the tens of thousands), and each cluster's similarity
matrix is one numpy matmul inside ``applyInPandas``, Arrow-batched,
never a row-at-a-time UDF and never a global cross join. This is the
embedding-space member of the dedup family next to the token-space
MinHash/SimHash/winnow passes in operators/dedup.py — it catches
paraphrases and re-renderings those cannot see.

Degenerate-cluster valve (``max_cluster_size``): on web-scale corpora
k-means clusters skew hard — boilerplate concentrates — and an
unbounded per-cluster matmul means ONE task holding an O(n_c²)
similarity matrix, the same failure mode the MinHash/SimHash buckets
hit before their ``max_bucket_size`` caps (operators/dedup.py). The
valve here is EXACT, not lossy: an oversized cluster is split into
contiguous id-ordered blocks of ≤ max_cluster_size rows and every
unordered block PAIR becomes its own task (diagonal tasks do the
within-block upper triangle, off-diagonal tasks the cross-block
rectangle), so the pair set is identical to the uncapped computation
while per-task memory is bounded by a 2·max_cluster_size-row matrix.
A cluster of n_c rows costs B(B+1)/2 bounded tasks (B = ⌈n_c/max⌉)
that parallelize across the cluster instead of one OOM task; clusters
at or under the cap keep the exact original single-task plan (B = 1,
one diagonal task, no row replication).

Boundary recall (``n_assign``, the paper's top-2 caveat): a pair that
straddles two clusters is invisible to within-cluster search. With
``n_assign=2`` every vector joins its TWO nearest clusters
(operators/similarity.ivf_assign_topn), so a straddling pair meets in
at least one of them; duplicate discoveries (a pair sharing both
clusters) collapse through a (id_a, id_b) groupBy. Costs ~2× the
quadratic work — exactly the trade the paper describes.

Determinism: the keep rule is keep-LOWEST-id within a duplicate pair
(the same rule as exact_dedup), the quantizer is the seeded
deterministic k-means from operators/similarity.ivf_centroids, block
boundaries are id-ordered, and ties never matter because the drop set
is a union of "larger id of a too-similar pair" decisions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_topn,
    ivf_centroids,
)


def _norm_rows(pdf: pd.DataFrame, vec_col: str) -> np.ndarray:
    m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0.0] = 1e-12
    return m / norms[:, None]


def semdedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cluster_size: int | None = None,
    n_assign: int = 1,
) -> DataFrame:
    """(id_a, id_b, sim) pairs with cosine >= threshold and id_a < id_b,
    searched WITHIN each k-means cluster only. Pass prebuilt
    ``centroids`` to amortize quantizer training (production trains
    once per corpus snapshot, exactly like the IVF index);
    ``max_cluster_size`` bounds per-task memory on skewed clusters
    (exact block sharding — same pairs); ``n_assign=2`` adds the
    paper's top-2 cluster membership for boundary recall."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids=n_clusters, n_iter=2, seed=42,
                                  id_col=id_col, vec_col=vec_col)
    if n_assign <= 1:
        assigned = ivf_assign(corpus, centroids, vec_col=vec_col)
    else:
        assigned = ivf_assign_topn(corpus, centroids, n_assign=n_assign, vec_col=vec_col)
    assigned = assigned.select(id_col, vec_col, "list_id")
    id_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"id_a {id_t}, id_b {id_t}, sim double"

    def _triangle(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            # empty object-dtype columns convert to ANY Arrow type, so
            # this stays correct for string ids too
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        ids = pdf[id_col].to_numpy()  # numeric or lexicographic — both order
        m = _norm_rows(pdf, vec_col)
        sims = m @ m.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sims[ia, ib][keep]})

    if max_cluster_size is None:
        pairs = assigned.groupBy("list_id").applyInPandas(_triangle, schema=out_schema)
    else:
        if max_cluster_size < 1:
            raise ValueError("max_cluster_size must be >= 1")
        # Block shard: contiguous id-ordered blocks of <= max rows; a
        # row in block b fans out to every unordered block pair it
        # participates in — B task-rows per row for an oversized
        # cluster, exactly ONE for a cluster at or under the cap.
        w = Window.partitionBy("list_id")
        blk = (
            assigned.withColumn("__rn", F.row_number().over(w.orderBy(id_col)))
            .withColumn("__n", F.count(F.lit(1)).over(w))
            .withColumn(
                "__b", ((F.col("__rn") - 1) / F.lit(max_cluster_size)).cast("int")
            )
            .withColumn(
                "__nb", F.ceil(F.col("__n") / F.lit(max_cluster_size)).cast("int")
            )
        )
        tasks = blk.select(
            id_col,
            vec_col,
            "list_id",
            "__b",
            F.explode(F.sequence(F.lit(0), F.col("__nb") - 1)).alias("__p"),
        ).select(
            id_col,
            vec_col,
            "__b",
            "list_id",
            F.least("__b", "__p").alias("__bi"),
            F.greatest("__b", "__p").alias("__bj"),
        )

        def _block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            _, bi, bj = key
            if bi == bj:
                return _triangle(pdf)
            left = pdf[pdf["__b"] == bi]
            right = pdf[pdf["__b"] == bj]
            if left.empty or right.empty:
                return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
            sims = _norm_rows(left, vec_col) @ _norm_rows(right, vec_col).T
            ia, ib = np.nonzero(sims >= threshold)
            a = left[id_col].to_numpy()[ia]
            b = right[id_col].to_numpy()[ib]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sims[ia, ib]})

        pairs = tasks.groupBy("list_id", "__bi", "__bj").applyInPandas(
            _block_pairs, schema=out_schema
        )

    if n_assign > 1:
        # a pair sharing BOTH top-2 clusters is discovered twice; the
        # sim is the same dot product but computed in two matmuls, so
        # collapse via max, not distinct (BLAS blocking can differ ulp)
        pairs = pairs.groupBy("id_a", "id_b").agg(F.max("sim").alias("sim"))
    return pairs


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cluster_size: int | None = None,
    n_assign: int = 1,
) -> DataFrame:
    """The deduplicated corpus: for every too-similar pair the larger
    id drops (keep-first, matching exact_dedup), via one anti-join of
    the corpus against the pair list's id_b side."""
    drops = (
        semdedup_pairs(
            corpus, threshold, n_clusters, id_col, vec_col, centroids,
            max_cluster_size=max_cluster_size, n_assign=n_assign,
        )
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return corpus.join(drops, id_col, "left_anti")
