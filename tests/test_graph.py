"""connected_components vs a direct union-find reference over random
edge lists (forced collisions via a tiny node universe: chains, stars,
cycles, self-loops, parallel edges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


# min-label components == min node id per union-find component
def _canon(comp: dict[int, int]) -> dict[int, int]:
    best: dict[int, int] = {}
    for n, c in comp.items():
        best[c] = min(best.get(c, n), n)
    return {n: best[c] for n, c in comp.items()}


edge = st.tuples(st.integers(0, 12), st.integers(0, 12))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(edge, min_size=1, max_size=25))
def test_cc_matches_union_find(spark, edges):
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == _canon(_uf_components(edges))


def test_cc_long_chain_converges(spark):
    # a 30-node path: worst diameter relative to size; every node must
    # end up labeled with node 0
    edges = [(i, i + 1) for i in range(30)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert got == {i: 0 for i in range(31)}


# ------------------------- large-star / small-star (high-diameter path)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(edge, min_size=1, max_size=25))
def test_cc_star_matches_union_find(spark, edges):
    # same oracle as min-label propagation: identical components on
    # random graphs with forced collisions/self-loops/parallel edges
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["comp"] for r in connected_components_star(df).collect()}
    assert got == _canon(_uf_components(edges))


def test_cc_star_path_graph_matches_minlabel_in_polylog_rounds(spark):
    # A 64-node path is the adversarial case for min-label propagation
    # (O(diameter) = 64 rounds); large-star/small-star must produce the
    # identical labeling in O(log² n) rounds. max_iter=14 would make
    # linear-round convergence raise, so passing IS the round-count
    # assertion (log2(65)² ≈ 36 ≥ actual; observed ≈ 5).
    edges = [(i, i + 1) for i in range(64)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {
        r["node"]: r["comp"]
        for r in connected_components_star(df, max_iter=14).collect()
    }
    assert got == {i: 0 for i in range(65)}


def test_cc_star_two_components_and_self_loop(spark):
    edges = [(5, 6), (6, 7), (10, 11), (3, 3)]
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r["node"]: r["comp"] for r in connected_components_star(df).collect()}
    assert got == {5: 5, 6: 5, 7: 5, 10: 10, 11: 10, 3: 3}


def test_pagerank_star_graph_centrality_and_mass(spark):
    """On a 4-spoke star the hub must out-rank every spoke, spokes tie
    exactly (identical position), and total mass stays 1 within the
    iteration rounding budget."""
    from data_ingestion_project_spark.operators.pagerank import pagerank, symmetrize

    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    ranks = {r["node"]: r["rank"] for r in pagerank(symmetrize(pairs), iterations=10).collect()}
    assert set(ranks) == {0, 1, 2, 3, 4}
    hub, spokes = ranks[0], [ranks[i] for i in range(1, 5)]
    assert all(hub > s for s in spokes)
    assert len(set(spokes)) == 1  # symmetric nodes agree bit-for-bit
    assert abs(sum(ranks.values()) - 1.0) < 1e-6


def test_pagerank_uniform_on_cycle(spark):
    """A ring is perfectly symmetric: every node must hold exactly the
    uniform rank after any number of iterations."""
    from data_ingestion_project_spark.operators.pagerank import pagerank, symmetrize

    n = 6
    pairs = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "id_a long, id_b long"
    )
    ranks = [r["rank"] for r in pagerank(symmetrize(pairs), iterations=5).collect()]
    assert len(ranks) == n
    assert all(abs(r - 1.0 / n) < 1e-9 for r in ranks)


def _py_pagerank(edges, iterations=5, damping=0.85):
    """Pure-Python reference mirroring the operator's determinism
    contract (rounded contributions, exact inbox sums, rounded ranks)."""
    from collections import defaultdict

    out = defaultdict(list)
    for s, d in edges:
        out[s].append(d)
    n = len(out)
    ranks = {s: 1.0 / n for s in out}
    for _ in range(iterations):
        inbox = defaultdict(float)  # sums of pre-rounded values are exact enough at test scale
        for s, dsts in out.items():
            c = round(ranks[s] / len(dsts), 14)
            for d in dsts:
                inbox[d] += c
        ranks = {
            node: round((1.0 - damping) / n + damping * tot, 10)
            for node, tot in inbox.items()
        }
    return ranks


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_pagerank_matches_python_reference(spark, edges):
    """On random graphs the distributed unrolled plan must equal a
    pure-Python replay of the same contract to float tolerance."""
    from data_ingestion_project_spark.operators.pagerank import pagerank, symmetrize

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    sym = symmetrize(pairs)
    got = {r["node"]: r["rank"] for r in pagerank(sym, iterations=3).collect()}
    ref = _py_pagerank(
        [(r["src"], r["dst"]) for r in sym.collect()], iterations=3
    )
    assert set(got) == set(ref)
    for node in ref:
        assert abs(got[node] - ref[node]) < 1e-9, (node, got[node], ref[node])


def test_pagerank_redistribute_handles_dangling_directed_graph(spark):
    """On a directed chain a→b→c, node c is dangling: the ignore model
    leaks its mass (sum < 1 and c never appears), the redistribute
    model keeps the full vertex set with total mass ~1 and ranks
    ordered a < b < c (rank accumulates down the chain)."""
    from data_ingestion_project_spark.operators.pagerank import pagerank

    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    full = {r["node"]: r["rank"] for r in
            pagerank(e, iterations=20, dangling="redistribute").collect()}
    assert set(full) == {0, 1, 2}
    assert abs(sum(full.values()) - 1.0) < 1e-6
    assert full[0] < full[1] < full[2]

    leaky = {r["node"]: r["rank"] for r in pagerank(e, iterations=20).collect()}
    assert sum(leaky.values()) < 0.9  # mass visibly leaks without recycling
    # ADVICE r7: EVERY source node survives every round — node 0 has
    # indegree 0 yet must hold the exact power-method teleport floor
    # (1-d)/n and keep voting (node 1 = floor + d·(rank0/outdeg 1)).
    # The sink (node 2) reports its received rank; its mass is simply
    # never recycled (leaks next round), hence the sum bound above.
    assert set(leaky) == {0, 1, 2}
    n = 2  # source-node count: {0, 1} — the teleport denominator
    floor = (1.0 - 0.85) / n
    assert leaky[0] == round(floor, 10)
    assert abs(leaky[1] - (floor + 0.85 * round(leaky[0] / 1, 14))) < 1e-9
    assert abs(leaky[2] - (floor + 0.85 * round(leaky[1] / 1, 14))) < 1e-9


def test_k_core_planted_graph(spark):
    """Planted structure: a 5-clique (4-core) plus a chain of pendants
    hanging off it. Peeling with k=3 must keep exactly the clique —
    every pendant (degree 1-2) strips, including cascades."""
    from data_ingestion_project_spark.operators.graph import k_core
    from data_ingestion_project_spark.operators.pagerank import symmetrize

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]  # pendant path off node 4
    edges = spark.createDataFrame(clique + chain, "id_a long, id_b long")
    core = {r["node"]: r["core_degree"] for r in k_core(symmetrize(edges), 3).collect()}
    assert set(core) == {0, 1, 2, 3, 4}
    assert all(d == 4 for d in core.values())
    # k above the clique's degree empties the core
    assert k_core(symmetrize(edges), 5).count() == 0


def test_k_core_fixpoint_within_rounds(spark):
    """The corpus dup graph's peel reaches fixpoint within the 8 spec
    rounds: 8-round and 12-round peels agree (so the fixed-round spec
    output IS the true 3-core here)."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.graph import k_core
    from data_ingestion_project_spark.operators.pagerank import symmetrize
    from data_ingestion_project_spark.queries.documents import (
        _PAGERANK_EDGE_MIN_SHARED,
        _winnow_pair_counts,
    )

    pairs = _winnow_pair_counts(spark, "/root/testdata/sf0.001").filter(
        F.col("n_shared") >= _PAGERANK_EDGE_MIN_SHARED
    )
    e = symmetrize(pairs)
    r8 = sorted(map(tuple, k_core(e, 3, rounds=8).collect()))
    r12 = sorted(map(tuple, k_core(e, 3, rounds=12).collect()))
    assert r8 == r12 and len(r8) > 0


# ------------------------------------------------ BFS frontier distances


def _py_bfs(edges: list[tuple[int, int]], seeds: set[int]) -> dict[int, int]:
    from collections import deque

    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist = {s: 0 for s in seeds}
    q = deque(seeds)
    while q:
        n = q.popleft()
        for m in adj.get(n, ()):  # directed expansion, like the operator
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(edges=st.lists(edge, min_size=1, max_size=25))
def test_bfs_matches_python_reference(spark, edges):
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.graph import bfs_distances

    df = spark.createDataFrame(edges, "src int, dst int")
    seed_node = min(s for s, _ in edges)
    seed = df.agg(F.min("src").alias("node"))
    got = {r["node"]: r["dist"] for r in bfs_distances(df, seed, max_depth=30).collect()}
    assert got == _py_bfs(edges, {seed_node})


def test_bfs_multi_source_and_depth_cap(spark):
    """Two seeds on a 10-node path: distances are min-over-seeds, and
    max_depth truncates the settled set (nodes beyond the cap absent,
    not mislabeled)."""
    from data_ingestion_project_spark.operators.graph import bfs_distances

    edges = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(edges, "src int, dst int")
    seeds = spark.createDataFrame([(0,), (7,)], "node int")
    got = {r["node"]: r["dist"] for r in bfs_distances(df, seeds, max_depth=2).collect()}
    # forward-only edges: node 3 is 3 hops from 0 and unreachable from 7
    assert got == {0: 0, 7: 0, 1: 1, 8: 1, 2: 2, 9: 2}


def test_bfs_corpus_fixpoint_within_rounds(spark):
    """The corpus dup graph's reachable eccentricity from the min doc id
    is within the 8 spec rounds: 8-round and 12-round walks agree, so
    the unrolled SQL twin replays the true distances."""
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.graph import bfs_distances
    from data_ingestion_project_spark.operators.pagerank import symmetrize
    from data_ingestion_project_spark.queries.documents import (
        _PAGERANK_EDGE_MIN_SHARED,
        _winnow_pair_counts,
    )

    pairs = _winnow_pair_counts(spark, "/root/testdata/sf0.001").filter(
        F.col("n_shared") >= _PAGERANK_EDGE_MIN_SHARED
    )
    sym = symmetrize(pairs).localCheckpoint(eager=True)
    seed = sym.agg(F.min("src").alias("node"))
    r8 = sorted(map(tuple, bfs_distances(sym, seed, max_depth=8).collect()))
    r12 = sorted(map(tuple, bfs_distances(sym, seed, max_depth=12).collect()))
    assert r8 == r12 and len(r8) > 0


def test_assortativity_star_is_minus_one(spark):
    """A pure star is maximally disassortative: every edge joins the
    degree-n hub to a degree-1 leaf, so the degree correlation over
    the symmetrized edge list is exactly -1."""
    import numpy as np
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.pagerank import symmetrize

    edges = spark.createDataFrame([(0, i) for i in range(1, 7)], "src long, dst long")
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    e = (
        sym.join(deg.select("src", F.col("deg").alias("dx")), "src")
        .join(
            deg.select(F.col("src").alias("dst"), F.col("deg").alias("dy")), "dst"
        )
        .toPandas()
    )
    r = np.corrcoef(e["dx"], e["dy"])[0, 1]
    assert abs(r - (-1.0)) < 1e-12


def test_driver_exact_chain_replays_match_distributed(spark):
    """The bounded-collect driver replays (stationary_distribution_exact,
    hitting_time_exact) must be BIT-IDENTICAL to the distributed
    unrolled loops on the sf0.001 event chain — the contract that lets
    the markov queries serve the iteration scheduler-free while the
    DuckDB oracle keeps certifying the distributed arithmetic."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.operators.pagerank import (
        hitting_time,
        hitting_time_exact,
        stationary_distribution,
        stationary_distribution_exact,
    )

    e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    trans = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("src"), F.col("event_type").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    pi_dist = sorted(map(tuple, stationary_distribution(trans, iterations=20).collect()))
    pi_exact = sorted(map(tuple, stationary_distribution_exact(trans, iterations=20).collect()))
    assert pi_dist == pi_exact  # exact float equality, not approx

    h_dist = sorted(map(tuple, hitting_time(trans, "purchase", iterations=40).collect()))
    h_exact = sorted(map(tuple, hitting_time_exact(trans, "purchase", iterations=40).collect()))
    assert h_dist == h_exact


def test_driver_exact_chain_replay_state_cap(spark, monkeypatch):
    """The bounded-collect doctrine requires the cap to be ENFORCED
    before an unbounded materialization, not merely declared: an
    over-cap transition frame must raise, and the collect itself must
    be limit-bounded at cap²+1 rows (ADVICE r11)."""
    import pytest

    from data_ingestion_project_spark.operators import pagerank as pr

    assert pr._DRIVER_STATE_CAP == 1024
    # shrink the cap so the over-cap path is exercised with a tiny frame
    monkeypatch.setattr(pr, "_DRIVER_STATE_CAP", 3)
    trans = spark.createDataFrame(
        [(f"s{i}", f"s{(i + 1) % 5}", 1) for i in range(5)],
        "src string, dst string, n long",
    )
    with pytest.raises(ValueError, match="capped at 3 states"):
        pr._collect_prob_cells(trans, "src", "dst", "n")
    # a dense over-cap frame trips the row-count bound (cap²+1 collected
    # rows prove K > cap) even before distinct sources are counted
    dense = spark.createDataFrame(
        [(f"a{i}", f"a{j}", 1) for i in range(4) for j in range(4)],
        "src string, dst string, n long",
    )
    with pytest.raises(ValueError, match="capped at 3 states"):
        pr._collect_prob_cells(dense, "src", "dst", "n")
    # at-cap frames still pass
    ok = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 2), ("c", "a", 3)],
        "src string, dst string, n long",
    )
    assert len(pr._collect_prob_cells(ok, "src", "dst", "n")) == 3
