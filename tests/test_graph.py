"""connected_components vs a direct union-find reference over random
edge lists (forced collisions via a tiny node universe: chains, stars,
cycles, self-loops, parallel edges)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_ingestion_project_spark.operators.graph import connected_components


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
