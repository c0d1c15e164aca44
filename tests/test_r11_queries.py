"""Round-11 query replays: pure-Python/numpy re-derivations of the
round-11 certified queries (the tests/test_r{N}_queries.py pattern —
an engine-independent THIRD implementation pinning every value the
driver's DuckDB oracle also checks, so a regression is caught even on
corpora the driver never runs)."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import duckdb
import numpy as np
import pytest

SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from data_ingestion_project_spark.session import build_session

    s = build_session("test-r11")
    yield s


def _floor_round(x: float, nd: int) -> float:
    m = 10.0**nd
    return math.copysign(math.floor(abs(x) * m + 0.5) / m, x) if x else 0.0


def _half_up(x: float) -> int:
    """round-half-away-from-zero — the F.round / DuckDB round mode
    (Python's built-in round is banker's and must not be used)."""
    return int(math.copysign(math.floor(abs(x) + 0.5), x))


def test_friedman_revenue_dow_matches_python_replay(spark):
    # sf0.01: sf0.001's order dates are too sparse to fill any
    # complete 7-day week block (the query correctly returns an empty
    # frame there); the certification corpus has full blocks
    from data_ingestion_project_spark.queries import all_queries

    sf = "/root/testdata/sf0.01"
    rows = all_queries()["friedman_revenue_dow"](spark, sf).collect()
    assert len(rows) == 7 and [r["dow"] for r in rows] == list(range(1, 8))

    daily = duckdb.sql(
        f"""SELECT CAST(date_trunc('week', d) AS DATE) AS wk,
                   CAST(isodow(d) AS INT) AS dow, cents
            FROM (SELECT CAST(o_orderdate AS DATE) AS d,
                         SUM(CAST(o_totalprice * 100 AS BIGINT)) AS cents
                  FROM '{sf}/orders.parquet' GROUP BY 1) t"""
    ).fetchall()
    by_wk: dict = defaultdict(list)
    for wk, dow, cents in daily:
        by_wk[wk].append((dow, cents))
    blocks = {wk: v for wk, v in by_wk.items() if len(v) == 7}
    n = len(blocks)
    a2 = Counter()
    ssq2 = 0
    for v in blocks.values():
        vals = sorted(c for _, c in v)
        for dow, c in v:
            rank_min = vals.index(c) + 1
            ties = vals.count(c)
            r2 = 2 * rank_min + ties - 1
            a2[dow] += r2
            ssq2 += r2 * r2
    num2 = sum((a2[d] - 8 * n) ** 2 for d in range(1, 8))
    q = 6.0 * num2 / (ssq2 - 448 * n)
    got = rows[0]
    assert got["n_blocks"] == n
    assert got["q_friedman"] == _floor_round(q, 6)
    assert got["w_kendall"] == _floor_round(q / (6.0 * n), 6)
    for r in rows:
        assert r["mean_rank"] == _floor_round(a2[r["dow"]] / (2.0 * n), 6)
    # rank algebra invariant: mean ranks average to (k+1)/2 = 4
    assert abs(sum(r["mean_rank"] for r in rows) / 7.0 - 4.0) < 1e-6


def test_jarque_bera_matches_numpy_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = {r["status"]: r for r in all_queries()["jarque_bera_order_totals"](spark, SF0001).collect()}
    x = duckdb.sql(
        f"SELECT o_orderstatus, CAST(trunc(o_totalprice) AS BIGINT) "
        f"FROM '{SF0001}/orders.parquet'"
    ).fetchall()
    allv = np.array([v for _, v in x], dtype=np.int64)
    p = math.floor(float(allv.sum()) / float(len(allv)))
    groups = defaultdict(list)
    for s, v in x:
        groups[s].append(v)
    groups["TOTAL"] = [v for _, v in x]
    assert set(rows) == set(groups)
    for s, vals in groups.items():
        v = np.array(vals, dtype=object)  # exact int sums, no overflow
        nn = len(vals)
        dev = [int(t) - p for t in vals]
        s1 = sum(dev)
        s2 = sum(d * d for d in dev)
        s3 = sum(d**3 for d in dev)
        s4 = sum(d**4 for d in dev)
        n_d = float(nn)
        d_ = float(s1) / n_d
        r2, r3, r4 = float(s2) / n_d, float(s3) / n_d, float(s4) / n_d
        m2 = r2 - d_ * d_
        m3 = r3 - 3.0 * d_ * r2 + 2.0 * d_ * d_ * d_
        m4 = r4 - 4.0 * d_ * r3 + 6.0 * d_ * d_ * r2 - 3.0 * d_ * d_ * d_ * d_
        skew = m3 / (m2 * math.sqrt(m2))
        exk = m4 / (m2 * m2) - 3.0
        jb = n_d / 6.0 * (skew * skew + exk * exk / 4.0)
        got = rows[s]
        assert got["n"] == nn, s
        assert got["skewness"] == pytest.approx(_floor_round(skew, 6), abs=2e-6), s
        assert got["excess_kurtosis"] == pytest.approx(_floor_round(exk, 6), abs=2e-6), s
        assert got["jb_stat"] == pytest.approx(_floor_round(jb, 4), abs=2e-4), s


def test_theil_decomposition_matches_python_and_is_additive(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = {r["nation"]: r for r in all_queries()["theil_inequality_nations"](spark, SF0001).collect()}
    cust = duckdb.sql(
        f"""SELECT n.n_name, SUM(CAST(o.o_totalprice * 100 AS BIGINT)) AS x
            FROM '{SF0001}/orders.parquet' o
            JOIN '{SF0001}/customer.parquet' c ON c.c_custkey = o.o_custkey
            JOIN '{SF0001}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
            GROUP BY o.o_custkey, n.n_name"""
    ).fetchall()
    by_nat = defaultdict(list)
    for nat, xv in cust:
        by_nat[nat].append(int(xv))
    x_all = sum(sum(v) for v in by_nat.values())
    n_all = sum(len(v) for v in by_nat.values())
    qmu_all = _half_up(math.log(x_all / n_all) * 1e8)
    fold_all = sum(
        xv * _half_up(math.log(xv) * 1e8) for v in by_nat.values() for xv in v
    )
    t_total = (fold_all / x_all - qmu_all) / 1e8
    assert rows["TOTAL"]["theil_within"] == pytest.approx(_floor_round(t_total, 6), abs=2e-6)
    within_sum = between_sum = 0.0
    for nat, v in by_nat.items():
        xg, ng = sum(v), len(v)
        share = xg / x_all
        qmu_g = _half_up(math.log(xg / ng) * 1e8)
        fold = sum(xv * _half_up(math.log(xv) * 1e8) for xv in v)
        t_w = (fold / xg - qmu_g) / 1e8
        got = rows[nat]
        assert got["n_customers"] == ng, nat
        assert got["revenue_share"] == pytest.approx(_floor_round(share, 6), abs=2e-6), nat
        assert got["theil_within"] == pytest.approx(_floor_round(t_w, 6), abs=2e-6), nat
        within_sum += share * t_w
        between_sum += share * (qmu_g - qmu_all) / 1e8
    # the decomposition identity (up to ln-quantization, ~1e-8/term)
    assert t_total == pytest.approx(within_sum + between_sum, abs=1e-5)
    # Theil T is non-negative and between-component can't exceed total
    assert t_total >= 0 and between_sum <= t_total + 1e-9


def test_log_odds_dirichlet_matches_python_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["log_odds_dirichlet_words"](spark, SF0001).collect()
    assert len(got) == 15
    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    lang_counts = Counter(lang for lang, _ in docs)
    target = sorted(lang_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    y1, y2 = Counter(), Counter()
    for lang, text in docs:
        words = re.split(r"\s+", text.strip().lower())
        (y1 if lang == target else y2).update(words)
    n1, n2 = sum(y1.values()), sum(y2.values())
    n_all = n1 + n2
    scored = []
    for w in set(y1) | set(y2):
        aw = 1000.0 * (y1[w] + y2[w]) / n_all
        q = lambda v: _half_up(math.log(v) * 1e8)
        delta = (
            q(y1[w] + aw) - q(n1 + 1000.0 - y1[w] - aw)
            - q(y2[w] + aw) + q(n2 + 1000.0 - y2[w] - aw)
        ) / 1e8
        sigma = math.sqrt(1.0 / (y1[w] + aw) + 1.0 / (y2[w] + aw))
        scored.append((w, y1[w], y2[w], delta, delta / sigma))
    scored.sort(key=lambda t: (-_floor_round(t[4], 6), t[0]))
    for r, (w, c1, c2, delta, z) in zip(got, scored[:15]):
        assert r["word"] == w and r["target_lang"] == target
        assert (r["n_target"], r["n_rest"]) == (c1, c2)
        assert r["log_odds_delta"] == pytest.approx(_floor_round(delta, 6), abs=2e-6)
        assert r["z_score"] == pytest.approx(_floor_round(z, 6), abs=2e-6)


def test_int8_quantization_matches_numpy_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    got = {r["dim"]: r for r in all_queries()["int8_quantization_audit"](spark, SF0001).collect()}
    embs = duckdb.sql(
        f"SELECT embedding FROM '{SF0001}/embeddings.parquet'"
    ).fetchall()
    m = np.array([e[0] for e in embs], dtype=np.float64)
    xq = (np.sign(m) * np.floor(np.abs(m * 1e4) + 0.5)).astype(np.int64)
    u = 127.0 * 1e4
    for dim in range(m.shape[1]):
        col = xq[:, dim]
        s = int(max(abs(int(col.min())), abs(int(col.max()))))
        if s == 0:
            assert dim not in got
            continue
        qcodes = (254 * col + s) // (2 * s)  # floor division == floor()
        assert qcodes.min() >= -127 and qcodes.max() <= 127
        err = 127 * col - qcodes * s
        r = got[dim]
        assert r["n"] == len(col)
        assert r["scale"] == pytest.approx(_floor_round(s / u, 8), abs=2e-8)
        mse_root = math.sqrt(float((err.astype(object) ** 2).sum()) / len(col)) / u
        assert r["rmse"] == pytest.approx(_floor_round(mse_root, 8), abs=2e-8)
        assert r["max_abs_err"] == pytest.approx(
            _floor_round(int(np.abs(err).max()) / u, 8), abs=2e-8
        )
        # int8 reconstruction can never be off by more than half a step
        # (1e-7 slack: both sides are independently floor-rounded at 8dp)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-7


def test_ndcg_matches_python_bm25_replay(spark):
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.advanced import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
    )

    got = all_queries()["ndcg_search_eval"](spark, SF0001).collect()
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    toks = {d: re.split(r"\s+", t.strip().lower()) for d, t in docs}
    dls = {d: len(w) for d, w in toks.items()}
    n_docs, sum_dl = float(len(docs)), float(sum(dls.values()))
    tf = {d: Counter(w for w in ws if w in BM25_TERMS) for d, ws in toks.items()}
    df = Counter(t for d in tf.values() for t in d)
    totals = {}
    for d, c in tf.items():
        tot = 0
        for w, f in c.items():
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            tfn = (f * (BM25_K1 + 1)) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dls[d] * n_docs / sum_dl)
            )
            tot += _half_up(idf * tfn * 1_000_000)
        if tot:
            totals[d] = tot
    top = sorted(totals.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rel = {d: sum(c.values()) for d, c in tf.items()}
    dcg_q = sum(
        _half_up(rel.get(d, 0) * 1e8 / math.log2(i + 2))
        for i, (d, _) in enumerate(top)
    )
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    idcg_q = sum(
        _half_up(rv * 1e8 / math.log2(i + 2)) for i, (_, rv) in enumerate(ideal)
    )
    for i, r in enumerate(got):
        assert r["doc_id"] == top[i][0]
        assert r["rel"] == rel.get(top[i][0], 0)
    assert got[0]["dcg_at10"] == pytest.approx(_floor_round(dcg_q / 1e8, 6), abs=2e-6)
    assert got[0]["idcg_at10"] == pytest.approx(_floor_round(idcg_q / 1e8, 6), abs=2e-6)
    assert got[0]["ndcg_at10"] == pytest.approx(
        _floor_round(dcg_q / idcg_q, 6), abs=2e-6
    )
    assert 0.0 < got[0]["ndcg_at10"] <= 1.0


def test_g_test_matches_python_replay(spark):
    """G-test: pure-Python replay of the cell quantization and the
    exact integer fold from raw duckdb counts."""
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["g_test_event_dow"](spark, SF0001).collect()
    cells = duckdb.sql(
        f"""SELECT event_type, CAST(date_part('isodow', ts) AS INT) AS dow,
                   COUNT(*) AS o
            FROM '{SF0001}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    rt, ct, n = defaultdict(int), defaultdict(int), 0
    for t, d, o in cells:
        rt[t] += o
        ct[d] += o
        n += o
    dof = (len(rt) - 1) * (len(ct) - 1)
    exp = {(t, d): float(rt[t]) * float(ct[d]) / n for t, d, _ in cells}
    cell_i = {
        (t, d): int(2.0 * float(o) * math.log(float(o) / exp[(t, d)]) * 1e6)
        for t, d, o in cells
    }
    g_i = sum(cell_i.values())
    assert len(got) == len(cells)
    for r in got:
        k = (r["event_type"], r["dow"])
        assert r["cell_g"] == cell_i[k] / 1e6
        assert r["g_stat"] == g_i / 1e6
        assert r["dof"] == dof
    assert g_i / 1e6 > 0.0


def test_cochran_armitage_matches_python_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["cochran_armitage_returns"](spark, SF0001).collect()
    rows = duckdb.sql(
        f"""WITH ret AS (SELECT DISTINCT l_orderkey FROM '{SF0001}/lineitem.parquet'
                         WHERE l_returnflag = 'R')
            SELECT CAST(substr(o_orderpriority, 1, 1) AS INT) AS t,
                   COUNT(*) AS n,
                   SUM(CASE WHEN r.l_orderkey IS NOT NULL THEN 1 ELSE 0 END) AS rr
            FROM '{SF0001}/orders.parquet' o
            LEFT JOIN ret r ON r.l_orderkey = o.o_orderkey
            GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    nn = sum(r[1] for r in rows)
    rtot = sum(r[2] for r in rows)
    st_r = sum(t * r for t, _, r in rows)
    st_n = sum(t * n for t, n, _ in rows)
    st2n = sum(t * t * n for t, n, _ in rows)
    pbar = rtot / nn
    z = (st_r - pbar * float(st_n)) / math.sqrt(
        pbar * (1.0 - pbar) * (float(st2n) - float(st_n) * float(st_n) / nn)
    )
    by_t = {r["priority_score"]: r for r in got}
    assert len(got) == len(rows)
    for t, n, r in rows:
        assert by_t[t]["n_orders"] == n and by_t[t]["n_returned"] == r
        assert by_t[t]["return_rate"] == pytest.approx(_floor_round(r / n, 6), abs=2e-6)
        assert by_t[t]["z_ca"] == pytest.approx(_floor_round(z, 6), abs=2e-6)
        assert by_t[t]["chi2_ca"] == pytest.approx(_floor_round(z * z, 6), abs=2e-6)


def test_permutation_entropy_matches_python_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["permutation_entropy_revenue"](spark, SF0001).collect()
    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF0001}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    xs = [c for _, c in daily]
    pats = Counter()
    for i in range(2, len(xs)):
        x1, x2, x3 = xs[i - 2], xs[i - 1], xs[i]
        r1 = (x2 < x1) + (x3 < x1)
        r2 = (x1 <= x2) + (x3 < x2)
        r3 = (x1 <= x3) + (x2 <= x3)
        pats[f"{r1}{r2}{r3}"] += 1
    tt = sum(pats.values())
    hq = sum(_half_up((c / tt) * math.log(c / tt) * 1e9) for c in pats.values())
    by_p = {r["pattern"]: r for r in got}
    assert set(by_p) == set(pats)
    for p, c in pats.items():
        assert by_p[p]["n_triples"] == c
        assert by_p[p]["share"] == pytest.approx(_floor_round(c / tt, 6), abs=2e-6)
        assert by_p[p]["h_nats"] == -hq / 1e9
        assert by_p[p]["h_normalized"] == pytest.approx(
            _floor_round(-hq / 1e9 / 1.791759469228055, 6), abs=2e-6
        )
    # all ranks must form valid permutations of {0,1,2}
    assert all(sorted(p) == ["0", "1", "2"] for p in pats)


def test_map_mrr_matches_python_bm25_replay(spark):
    """Per-term BM25 ranking + AP/RR replayed from raw text in pure
    Python (the ndcg test's tokenizer), pinned against the query."""
    from data_ingestion_project_spark.queries.advanced import (
        BM25_B,
        BM25_K1,
        BM25_TERMS,
    )
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["map_mrr_search_eval"](spark, SF0001).collect()
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    tf: dict = {}
    dls: dict = {}
    for did, text in docs:
        words = re.split(r"\s+", text.strip().lower())
        dls[did] = len(words)
        c = Counter(w for w in words if w in BM25_TERMS)
        if c:
            tf[did] = c
    n_docs = float(len(dls))
    sum_dl = float(sum(dls.values()))
    df = Counter()
    for c in tf.values():
        for w in c:
            df[w] += 1
    ap_qs, rr_qs = {}, {}
    nrel = {}
    for w in sorted(df):
        scored = []
        for did, c in tf.items():
            if w not in c:
                continue
            f = c[w]
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            tfn = (f * (BM25_K1 + 1)) / (
                f + BM25_K1 * (1 - BM25_B + BM25_B * dls[did] * n_docs / sum_dl)
            )
            scored.append((did, _half_up(idf * tfn * 1_000_000), f >= 2))
        scored.sort(key=lambda x: (-x[1], x[0]))
        top = scored[:10]
        nrel[w] = sum(1 for _, _, r in scored if r)
        hits, sum_pq, first_hit = 0, 0, None
        for i, (_, _, r) in enumerate(top, start=1):
            if r:
                hits += 1
                sum_pq += _half_up(hits * 1e9 / i)
                if first_hit is None:
                    first_hit = i
        r10 = max(min(nrel[w], 10), 1)
        ap_qs[w] = _half_up(sum_pq / 1e9 / r10 * 1e6)
        rr_qs[w] = _half_up(1e6 / first_hit) if first_hit else 0
    nw = len(ap_qs)
    map_ = _floor_round(sum(ap_qs.values()) / 1e6 / nw, 6)
    mrr_ = _floor_round(sum(rr_qs.values()) / 1e6 / nw, 6)
    assert len(got) == nw
    for r in got:
        w = r["term"]
        assert r["n_relevant"] == nrel[w]
        assert r["ap_at10"] == ap_qs[w] / 1e6
        assert r["rr_at10"] == rr_qs[w] / 1e6
        assert r["map_at10"] == pytest.approx(map_, abs=2e-6)
        assert r["mrr_at10"] == pytest.approx(mrr_, abs=2e-6)
    assert all(0.0 <= r["ap_at10"] <= 1.0 for r in got)


def test_adamic_adar_matches_python_replay_on_certified_edges(spark):
    """AA scores replayed in pure Python from the (already oracle-
    certified, winnow_overlap_top) pair asset: degrees, common
    neighbors, 1/ln(deg) quantization, anti-join of existing edges,
    and the top-10 tie-break."""
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.documents import _winnow_pair_counts
    from pyspark.sql import functions as F

    got = all_queries()["adamic_adar_link_prediction"](spark, SF0001).collect()
    edges = {
        (r["id_a"], r["id_b"])
        for r in _winnow_pair_counts(spark, SF0001)
        .filter(F.col("n_shared") >= 20)
        .collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    scores = defaultdict(lambda: [0, 0])  # (n_common, score_q)
    for z, nb in nbrs.items():
        if len(nb) < 2:  # deg-1 nodes produce no candidate pair
            continue
        wq = _half_up(1e9 / math.log(len(nb)))
        for a in nb:
            for b in nb:
                if a < b and (a, b) not in edges:
                    scores[(a, b)][0] += 1
                    scores[(a, b)][1] += wq
    top = sorted(scores.items(), key=lambda kv: (-kv[1][1], kv[0]))[:10]
    assert len(got) == min(10, len(scores))
    for r, ((a, b), (nc, sq)) in zip(got, top):
        assert (r["id_a"], r["id_b"]) == (a, b)
        assert r["n_common"] == nc
        assert r["aa_score"] == sq / 1e9


def test_rbo_rank_overlap_bounds_and_python_replay(spark):
    """RBO: replay the depth-weighted agreement fold from the two
    certified 10-row rankings the query itself exposes (lex = bm25,
    dense = cosine) — the weights are pinned literals, so the fold is
    pure integer arithmetic to re-derive."""
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.advanced import _RBO_WEIGHTS

    got = all_queries()["rbo_rank_overlap"](spark, SF0001).collect()
    assert [r["depth"] for r in got] == list(range(1, 11))
    # x_d is nondecreasing and bounded by depth
    xs = [r["x_d"] for r in got]
    assert all(0 <= x <= d for x, d in zip(xs, range(1, 11)))
    assert all(a <= b for a, b in zip(xs, xs[1:]))
    rq = sum(_half_up(w * x / d * 1e9) for w, x, d in zip(_RBO_WEIGHTS, xs, range(1, 11)))
    for r in got:
        assert r["agreement"] == pytest.approx(
            _floor_round(r["x_d"] / r["depth"], 6), abs=2e-6
        )
        assert r["rbo_min_at10"] == rq / 1e9
    assert 0.0 <= got[0]["rbo_min_at10"] <= 1.0


def test_local_clustering_histogram_python_replay(spark):
    """Clustering coefficients replayed in pure Python from the
    certified pair asset (triangle enumeration + decile bucketing)."""
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.documents import _winnow_pair_counts
    from pyspark.sql import functions as F

    got = all_queries()["local_clustering_histogram"](spark, SF0001).collect()
    edges = {
        (r["id_a"], r["id_b"])
        for r in _winnow_pair_counts(spark, SF0001)
        .filter(F.col("n_shared") >= 20)
        .collect()
    }
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    buckets = Counter()
    cqs = []
    for v, nb in nbrs.items():
        d = len(nb)
        if d < 2:
            continue
        t = 0
        nl = sorted(nb)
        for i, x in enumerate(nl):
            for y in nl[i + 1 :]:
                if (min(x, y), max(x, y)) in edges:
                    t += 1
        c_q = _half_up(2e6 * t / (d * (d - 1)))
        cqs.append(c_q)
        buckets[min(c_q // 100_000, 9)] += 1
    by_b = {r["bucket"]: r for r in got}
    assert {b: r["n_nodes"] for b, r in by_b.items()} == dict(buckets)
    mean = _floor_round(sum(cqs) / len(cqs) / 1e6, 6)
    for r in got:
        assert r["n_eligible"] == len(cqs)
        assert r["mean_coeff"] == pytest.approx(mean, abs=2e-6)
        assert r["bucket_lo"] == r["bucket"] / 10.0


def test_jaccard_threshold_sweep_monotone_and_consistent(spark):
    """The sweep must be monotone nonincreasing in τ and agree with a
    direct duckdb pair computation at each threshold."""
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["jaccard_threshold_sweep"](spark, SF0001).collect()
    assert [r["threshold"] for r in got] == [0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]
    ps = [r["n_pairs"] for r in got]
    ds = [r["n_docs"] for r in got]
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    assert all(a >= b for a, b in zip(ds, ds[1:]))
    ref = duckdb.sql(
        f"""WITH words AS (
              SELECT doc_id, unnest(list_distinct(string_split_regex(
                regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+'))) AS word
              FROM '{SF0001}/documents.parquet'
            ), sizes AS (SELECT doc_id, COUNT(*) AS s FROM words GROUP BY 1),
            inter AS (
              SELECT a.doc_id ia, b.doc_id ib, COUNT(*) nc
              FROM words a JOIN words b ON a.word = b.word AND a.doc_id < b.doc_id
              GROUP BY 1, 2
            )
            SELECT ia, ib, nc * 1.0 / (sa.s + sb.s - nc) AS j
            FROM inter JOIN sizes sa ON sa.doc_id = ia JOIN sizes sb ON sb.doc_id = ib"""
    ).fetchall()
    for r in got:
        t = r["threshold"]
        hit = [(a, b) for a, b, j in ref if j >= t]
        assert r["n_pairs"] == len(hit)
        assert r["n_docs"] == len({x for p in hit for x in p})


def test_breusch_pagan_matches_python_moment_replay(spark):
    """BP/Koenker replayed from exact integer moments in pure Python
    (big ints — no numpy overflow), using the same pivot-shift
    multinomial expansion the query generates."""
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["breusch_pagan_price_quantity"](spark, SF0001).collect()[0]
    rows = duckdb.sql(
        f"SELECT CAST(l_quantity AS BIGINT), CAST(trunc(l_extendedprice) AS BIGINT) "
        f"FROM '{SF0001}/lineitem.parquet'"
    ).fetchall()
    n = len(rows)
    p = math.floor(sum(y for _, y in rows) / n)
    S = Counter()
    for xx, yy in rows:
        v = yy - p
        for i in range(5):
            for j in range(5 - i):
                S[(i, j)] += xx**i * v**j
    sd = {k: float(vv) for k, vv in S.items()}
    nn = float(n)
    bb = (nn * sd[(1, 1)] - sd[(1, 0)] * sd[(0, 1)]) / (
        nn * sd[(2, 0)] - sd[(1, 0)] * sd[(1, 0)]
    )
    aa = (sd[(0, 1)] - bb * sd[(1, 0)]) / nn

    def poly(order, with_x):
        tot = 0.0
        for pp in range(order + 1):
            for qq in range(order + 1 - pp):
                rr = order - pp - qq
                coef = (
                    math.factorial(order)
                    // (math.factorial(pp) * math.factorial(qq) * math.factorial(rr))
                ) * (-1) ** (qq + rr)
                tot += coef * aa**qq * bb**rr * sd[(rr + with_x, pp)]
        return tot

    su, sxu, suu = poly(2, 0), poly(2, 1), poly(4, 0)
    sxx_c = sd[(2, 0)] - sd[(1, 0)] ** 2 / nn
    sxu_c = sxu - sd[(1, 0)] * su / nn
    suu_c = suu - su * su / nn
    sigma2 = su / nn
    lm_k = nn * sxu_c * sxu_c / (sxx_c * suu_c)
    lm_c = sxu_c * sxu_c / (sxx_c * 2.0 * sigma2 * sigma2)
    assert got["n_rows"] == n
    assert got["slope_units_per_qty"] == pytest.approx(_floor_round(bb, 6), abs=2e-6)
    assert got["sigma2_hat"] == pytest.approx(_floor_round(sigma2, 2), rel=1e-9)
    assert got["lm_koenker"] == pytest.approx(_floor_round(lm_k, 4), abs=2e-4)
    assert got["lm_classic"] == pytest.approx(_floor_round(lm_c, 4), abs=2e-4)
    assert got["lm_koenker"] >= 0 and got["dof"] == 1


def test_periodogram_matches_numpy_and_parseval(spark):
    """Periodogram replayed with the same pinned angle literals in
    Python; the dominant period must maximize power, shares sum ≤ 1."""
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.stats import _periodogram_angles

    got = all_queries()["dominant_cycle_periodogram"](spark, SF0001).collect()
    assert [r["period"] for r in got] == list(range(2, 31))
    daily = duckdb.sql(
        f"""SELECT datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS t,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF0001}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    p = math.floor(sum(c for _, c in daily) / len(daily))
    ang = {(per, r): (c, s) for per, r, c, s in _periodogram_angles()}
    pw = {}
    for per in range(2, 31):
        a_q = b_q = 0
        for t, cents in daily:
            v = cents - p
            c, s = ang[(per, t % per)]
            a_q += _half_up(v * c * 1e3)
            b_q += _half_up(v * s * 1e3)
        pw[per] = a_q * a_q + b_q * b_q
    tot = sum(pw.values())
    by_p = {r["period"]: r for r in got}
    for per, q in pw.items():
        assert by_p[per]["power"] == q / 1e6
        assert by_p[per]["power_share"] == pytest.approx(
            _floor_round(q / tot, 6), abs=2e-6
        )
    best = max(pw, key=lambda k: (pw[k], -k))
    assert by_p[2]["dominant_period"] == best
    assert abs(sum(r["power_share"] for r in got) - 1.0) < 1e-4


def test_dunns_posthoc_matches_python_replay(spark):
    """Dunn's z replayed from pooled mid-ranks in pure Python; pair
    grid, tie-corrected variance, Bonferroni divisor."""
    from data_ingestion_project_spark.queries import all_queries

    got = all_queries()["dunns_posthoc_event_values"](spark, SF0001).collect()
    rows = duckdb.sql(
        f"SELECT CAST(trunc(value * 1000000) AS BIGINT), event_type "
        f"FROM '{SF0001}/events.parquet'"
    ).fetchall()
    vals = sorted(v for v, _ in rows)
    n = len(vals)
    # doubled mid-rank per distinct value
    from bisect import bisect_left, bisect_right

    def r2(v):
        lo, hi = bisect_left(vals, v), bisect_right(vals, v)
        return 2 * lo + (hi - lo) + 1

    groups = defaultdict(list)
    for v, t in rows:
        groups[t].append(v)
    ties = Counter(vals)
    tie_term = sum(c**3 - c for c in ties.values())
    s2 = n * (n + 1) / 12.0 - tie_term / (12.0 * (n - 1))
    k = len(groups)
    mr = {t: sum(r2(v) for v in vs) / 2.0 / len(vs) for t, vs in groups.items()}
    assert len(got) == k * (k - 1) // 2
    for r in got:
        ta, tb = r["type_a"], r["type_b"]
        assert ta < tb
        na, nb = len(groups[ta]), len(groups[tb])
        z = (mr[ta] - mr[tb]) / math.sqrt(s2 * (1.0 / na + 1.0 / nb))
        assert r["n_a"] == na and r["n_b"] == nb
        assert r["mean_rank_a"] == pytest.approx(_floor_round(mr[ta], 6), abs=2e-6)
        assert r["z_dunn"] == pytest.approx(_floor_round(z, 6), abs=2e-6)
        assert r["m_bonferroni"] == k * (k - 1) // 2


def test_nb_pr_auc_matches_python_replay(spark):
    """AP replayed from the exact integer decision margins via the
    same desc-threshold step formula in pure Python."""
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.documents import _NB_MODEL_CTES

    got = all_queries()["nb_pr_auc"](spark, SF0001).collect()[0]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF0001}/documents.parquet')"
    )
    stats = con.execute(
        _NB_MODEL_CTES
        + """
sc AS (
  SELECT s.doc_id, s.true_lang, s.m_lang, s.ll + p.p AS score
  FROM scored s JOIN prior p ON p.m_lang = s.m_lang
), pos AS (
  SELECT doc_id, CASE WHEN true_lang = 'en' THEN 1 ELSE 0 END AS is_pos,
         score AS s_pos FROM sc WHERE m_lang = 'en'
), oth AS (SELECT doc_id, MAX(score) AS s_oth FROM sc WHERE m_lang <> 'en' GROUP BY 1)
SELECT p.is_pos, CAST(p.s_pos - o.s_oth AS BIGINT) AS stat
FROM pos p JOIN oth o USING (doc_id)"""
    ).fetchall()
    per = defaultdict(lambda: [0, 0])
    for is_pos, stat in stats:
        per[stat][0] += is_pos
        per[stat][1] += 1 - is_pos
    p_tot = sum(v[0] for v in per.values())
    n_tot = sum(v[1] for v in per.values())
    sq = 0
    cum_pos = cum_neg = 0
    for stat in sorted(per):  # ascending; tp/fp = counts with stat >= s
        np_, nn_ = per[stat]
        tp = p_tot - cum_pos
        fp = n_tot - cum_neg
        sq += _half_up(np_ * (tp / (tp + fp)) * 1e9)
        cum_pos += np_
        cum_neg += nn_
    assert got["n_pos"] == p_tot and got["n_neg"] == n_tot
    assert got["prevalence"] == pytest.approx(
        _floor_round(p_tot / (p_tot + n_tot), 6), abs=2e-6
    )
    assert got["pr_auc"] == pytest.approx(
        _floor_round(sq / 1e9 / p_tot, 6), abs=2e-6
    )
    assert got["prevalence"] <= got["pr_auc"] <= 1.0  # better than random


def test_ewma_breach_days_matches_python_replay(spark):
    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.stats import _EWMA_WEIGHTS

    got = all_queries()["ewma_breach_days"](spark, SF0001).collect()
    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF0001}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    resid = []
    for t in range(1, len(daily)):
        num = den = 0
        for i, w in enumerate(_EWMA_WEIGHTS, start=1):
            if t - i < 0:
                break
            num += _half_up(w * daily[t - i][1] * 1e6)
            den += _half_up(w * 1e9)
        d, c = daily[t]
        resid.append((d, c, _half_up(c - num * 1000.0 / den)))
    n = len(resid)
    s1 = sum(r for _, _, r in resid)
    s2 = sum(r * r for _, _, r in resid)
    sd = math.sqrt((s2 - s1 * s1 / n) / n)
    breaches = [(d, c, r) for d, c, r in resid if abs(r) > 3.0 * sd]
    top = sorted(breaches, key=lambda x: (-abs(x[2]), x[0]))[:10]
    assert len(got) == min(10, len(breaches)) and len(breaches) >= 1
    for row, (d, c, r) in zip(got, top):
        assert row["day"] == str(d)
        assert row["revenue_usd"] == c / 100.0
        assert row["residual_usd"] == r / 100.0
        assert row["z_score"] == pytest.approx(_floor_round(r / sd, 4), abs=2e-4)
        assert row["n_breaches"] == len(breaches)
        assert row["n_days"] == n
