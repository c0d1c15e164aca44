"""Iterative graph operators on DataFrames: connected components.

The LLM-pipeline use case: near-dup pair generation (MinHash/winnow/
Jaccard) emits EDGES; dedup needs the transitive closure — duplicate
CLUSTERS — so one canonical document per component can be kept. That
closure is an iterative fixpoint, not a single SQL shape, so this is
one of the genuinely non-declarative operators (like the Lloyd loop in
operators/similarity.ivf_centroids): a driver-side loop over pure
DataFrame joins, converging in O(component diameter) rounds.

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round every node takes the min label over itself and its
neighbors; at the fixpoint every node carries the min node id of its
component. Near-dup clusters have small diameter (duplicates of one
document link to each other), so a handful of rounds suffice; for
high-diameter graphs at 100 TB swap in the alternating large-star /
small-star formulation (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) which converges in O(log²) rounds —
the round structure below (join + groupBy-min per round) is the same.

Each round is localCheckpoint'ed: it materializes the labels and cuts
the lineage chain, without which iteration i re-executes all previous
rounds and plan size grows without bound. Convergence is detected from
sum(label): min-propagation only ever lowers labels, so the sum is
strictly decreasing until the fixpoint — one cheap aggregate per
round, no self-join diffing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node of the undirected graph with the minimum node
    id reachable from it. Returns (node, comp) — one row per distinct
    node appearing in any edge. Deterministic for any partitioning.
    Raises if ``max_iter`` rounds do not reach the fixpoint (graph
    diameter exceeds max_iter)."""
    dtypes = dict(edges.dtypes)
    for col in (src, dst):  # BOTH ends: a string dst would coerce the
        # union to string just as silently as a string src
        id_type = dtypes.get(col, "")
        if id_type not in ("bigint", "int", "smallint", "tinyint"):
            # The sum-based convergence check is only sound for integral
            # labels (sum of a string column is NULL → None == None would
            # declare convergence after round 1, silently wrong). Reject
            # rather than be wrong; map string ids through xxhash64 or a
            # dense id first.
            raise ValueError(
                f"connected_components requires integral node ids, got {id_type!r} "
                f"for {col!r} — hash or dense-rank string ids first"
            )
    # Materialize the directed edge list ONCE, before the symmetric
    # union: the union's two branches are separate plan subtrees, so an
    # un-checkpointed input would execute the caller's whole
    # edge-producing pipeline (e.g. the winnow candidate generation)
    # TWICE — Spark does not share common subexpressions across union
    # branches. Observed 2× on dup_cluster_sizes before this.
    directed = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint(
        eager=True
    )
    # ... and the symmetric closure once more: every propagation round
    # joins against it — O(upstream + rounds), not O(rounds × upstream).
    sym = directed.union(
        directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)
    from pyspark.sql import Observation

    labels = sym.select(F.col("a").alias("node")).distinct().select(
        "node", F.col("node").alias("comp")
    )
    # observe() on the eager checkpoint: the initial label sum rides the
    # materialization job instead of costing a separate aggregate action.
    obs0 = Observation("cc_init")
    labels = labels.observe(obs0, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
    labels = labels.localCheckpoint(eager=True)
    prev_sum = obs0.get["s"]

    for i in range(max_iter):
        prop = sym.join(labels, sym["a"] == labels["node"]).select(
            F.col("b").alias("node"), F.col("comp")
        )
        new_labels = (
            labels.unionByName(prop).groupBy("node").agg(F.min("comp").alias("comp"))
        )
        # Piggyback the convergence aggregate on the checkpoint job via
        # observe(): one Spark job per round instead of two (the
        # observation fills during the eager materialization, so the
        # .get below does not launch a new action).
        obs = Observation(f"cc_round_{i}")
        new_labels = new_labels.observe(obs, F.sum(F.col("comp").cast("decimal(38,0)")).alias("s"))
        new_labels = new_labels.localCheckpoint(eager=True)
        new_sum = obs.get["s"]
        labels = new_labels
        if new_sum == prev_sum:
            return labels
        prev_sum = new_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
