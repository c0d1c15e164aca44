"""Round-10 query replays: pure-Python/numpy re-derivations of the
round-10 certified queries (the tests/test_r{N}_queries.py pattern —
an engine-independent second implementation pinning every value the
driver's DuckDB oracle also checks, so a regression is caught even on
corpora the driver never runs)."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_project_spark.session import build_session

    s = build_session("test-r10")
    yield s


def _hll_replay(users):
    """Pure-Python replay of operators/hll.py (md5 60-bit, m=1024)."""
    from data_ingestion_project_spark.operators.hll import HLL_ALPHA_NUM

    regs: dict[int, int] = {}
    for u in users:
        hv = int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        b, w = hv % 1024, hv // 1024
        rho = 51 if w == 0 else 51 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (51 - m) for m in regs.values()) + (1024 - len(regs)) * (1 << 51)
    v = 1024 - len(regs)
    raw = HLL_ALPHA_NUM / float(s)
    if raw <= 2560.0 and v > 0:
        q = round(math.log(1024.0 / v) * 1e8)
        return math.floor(1024.0 * q / 1e8 + 0.5)
    return math.floor(raw + 0.5)


def test_sketch_rollup_dau_matches_python_hll_replay(spark):
    """The portable register HLL must equal an independent pure-Python
    replay on every per-day row AND the register-union TOTAL row — the
    union identity (max of per-day registers == registers of the union
    of users) is what makes stored registers a valid date-range
    rollup."""
    from data_ingestion_project_spark.queries import all_queries

    got = {
        r["day"]: r["est_users"]
        for r in all_queries()["sketch_rollup_dau"](spark, SF0001).collect()
    }
    rows = duckdb.sql(
        f"""SELECT strftime(ts, '%Y-%m-%d') AS day, list(DISTINCT user_id)
            FROM '{SF0001}/events.parquet' GROUP BY 1"""
    ).fetchall()
    allu: set = set()
    expect = {}
    for day, us in rows:
        allu.update(us)
        expect[day] = _hll_replay(us)
    expect["TOTAL"] = _hll_replay(allu)
    assert got == expect
