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

Determinism: the keep rule is keep-LOWEST-id within a duplicate pair
(the same rule as exact_dedup), the quantizer is the seeded
deterministic k-means from operators/similarity.ivf_centroids, and
ties never matter because the drop set is a union of "larger id of a
too-similar pair" decisions.

Boundary caveat (inherited from the paper): a pair that straddles two
clusters is invisible. Recall can be raised by assigning each vector
to its top-2 clusters (double the quadratic work) — not done here;
the pytest plants duplicates and asserts the within-cluster contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_project_spark.operators.similarity import ivf_assign, ivf_centroids


def semdedup_pairs(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(id_a, id_b, sim) pairs with cosine >= threshold and id_a < id_b,
    searched WITHIN each k-means cluster only. Pass prebuilt
    ``centroids`` to amortize quantizer training (production trains
    once per corpus snapshot, exactly like the IVF index)."""
    if centroids is None:
        centroids = ivf_centroids(corpus, n_centroids=n_clusters, n_iter=2, seed=42,
                                  id_col=id_col, vec_col=vec_col)
    assigned = ivf_assign(corpus, centroids, vec_col=vec_col).select(
        id_col, vec_col, "list_id"
    )
    id_t = corpus.schema[id_col].dataType.simpleString()

    def _pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            # empty object-dtype columns convert to ANY Arrow type, so
            # this stays correct for string ids too
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []})
        ids = pdf[id_col].to_numpy()  # numeric or lexicographic — both order
        m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1e-12
        m = m / norms[:, None]
        sims = m @ m.T
        ia, ib = np.triu_indices(n, k=1)
        keep = sims[ia, ib] >= threshold
        a, b = ids[ia[keep]], ids[ib[keep]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "sim": sims[ia, ib][keep]})

    return assigned.groupBy("list_id").applyInPandas(
        _pairs, schema=f"id_a {id_t}, id_b {id_t}, sim double"
    )


def semdedup(
    corpus: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The deduplicated corpus: for every too-similar pair the larger
    id drops (keep-first, matching exact_dedup), via one anti-join of
    the corpus against the pair list's id_b side."""
    drops = (
        semdedup_pairs(corpus, threshold, n_clusters, id_col, vec_col, centroids)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    return corpus.join(drops, id_col, "left_anti")
