"""Round-10 query replays: pure-Python/numpy re-derivations of the
round-10 certified queries (the tests/test_r{N}_queries.py pattern —
an engine-independent second implementation pinning every value the
driver's DuckDB oracle also checks, so a regression is caught even on
corpora the driver never runs)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict

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


# ---------------------------------------------------------------- helpers


def _daily_cents(sf=SF0001):
    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{sf}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    return [int(c) for _, c in rows], [d for d, _ in rows]


def _fr(x, s=6):
    """floor_round replay: sign(x)*floor(|x|*10^s + 0.5)/10^s."""
    import math as _m

    m = 10**s
    return _m.copysign(_m.floor(abs(x) * m + 0.5) / m, x) if x != 0 else 0.0


def _mid_ranks(values):
    """value -> doubled mid rank (2*avg rank) over the list."""
    from collections import Counter as _C

    cnt = _C(values)
    out, below = {}, 0
    for v in sorted(cnt):
        out[v] = 2 * below + cnt[v] + 1
        below += cnt[v]
    return out, cnt


# ---------------------------------------------------------------- replays


def test_ordinal_association_panel_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(substr(o_orderpriority,1,1) AS INT),
                   CAST(least(floor(o_totalprice/100000.0),4) AS INT)
            FROM '{SF0001}/orders.parquet'"""
    ).fetchall()
    cells = Counter(rows)
    C = D = 0
    for (x1, y1), n1 in cells.items():
        for (x2, y2), n2 in cells.items():
            if x2 > x1 and y2 > y1:
                C += n1 * n2
            elif x2 > x1 and y2 < y1:
                D += n1 * n2
    n = sum(cells.values())
    tx2 = sum(v * (v - 1) for v in Counter(x for x, _ in rows).values())
    ty2 = sum(v * (v - 1) for v in Counter(y for _, y in rows).values())
    kx = len({x for x, _ in rows})
    ky = len({y for _, y in rows})
    m = min(kx, ky)
    got = all_queries()["ordinal_association_panel"](spark, SF0001).collect()[0]
    assert got["n"] == n and got["c_pairs"] == C and got["d_pairs"] == D
    assert got["gamma"] == _fr((C - D) / (C + D))
    assert got["somers_dyx"] == _fr(2 * (C - D) / (n * (n - 1) - tx2))
    assert got["somers_dxy"] == _fr(2 * (C - D) / (n * (n - 1) - ty2))
    assert got["tau_b"] == _fr(
        2 * (C - D) / math.sqrt((n * (n - 1) - tx2) * (n * (n - 1) - ty2))
    )
    assert got["tau_c"] == _fr(2 * m * (C - D) / (n * n * (m - 1)))


def test_cliffs_delta_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(round(c_acctbal*100,0) AS BIGINT), c_mktsegment
            FROM '{SF0001}/customer.parquet'
            WHERE c_mktsegment IN ('BUILDING','MACHINERY')"""
    ).fetchall()
    b = [v for v, s in rows if s == "BUILDING"]
    mch = [v for v, s in rows if s == "MACHINERY"]
    gt = sum(1 for x in b for y in mch if x > y)
    eq = sum(1 for x in b for y in mch if x == y)
    u1 = gt + eq / 2
    n1, n2 = len(b), len(mch)
    delta = 2 * u1 / (n1 * n2) - 1
    got = all_queries()["cliffs_delta_segments"](spark, SF0001).collect()[0]
    assert (got["n_building"], got["n_machinery"]) == (n1, n2)
    assert got["u1"] == _fr(u1, 1)
    assert got["cliffs_delta"] == _fr(delta)
    assert got["vda_a"] == _fr(u1 / (n1 * n2))
    lab = (
        "negligible" if abs(_fr(delta)) < 0.147
        else "small" if abs(_fr(delta)) < 0.33
        else "medium" if abs(_fr(delta)) < 0.474 else "large"
    )
    assert got["magnitude"] == lab


def test_capture_recapture_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    p = {
        u
        for (u,) in duckdb.sql(
            f"SELECT DISTINCT user_id FROM '{SF0001}/events.parquet' "
            f"WHERE event_type='purchase'"
        ).fetchall()
    }
    c = {
        u
        for (u,) in duckdb.sql(
            f"SELECT DISTINCT user_id FROM '{SF0001}/events.parquet' "
            f"WHERE event_type='click'"
        ).fetchall()
    }
    n1, n2, m = len(p), len(c), len(p & c)
    got = all_queries()["capture_recapture_users"](spark, SF0001).collect()[0]
    assert (got["n1"], got["n2"], got["m_both"]) == (n1, n2, m)
    assert got["chapman_est"] == (n1 + 1) * (n2 + 1) // (m + 1) - 1
    assert got["lp_est"] == n1 * n2 // m
    se = math.sqrt(
        (n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m) / ((m + 1) ** 2 * (m + 2))
    )
    assert got["chapman_se"] == _fr(se, 4)


def test_squared_rank_dispersion_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(round(o_totalprice*100,0) AS BIGINT), o_orderstatus
            FROM '{SF0001}/orders.parquet' WHERE o_orderstatus IN ('F','O')"""
    ).fetchall()
    vals = [v for v, _ in rows]
    r2, _ = _mid_ranks(vals)
    N = len(vals)
    A = {v: (r - (N + 1)) ** 2 for v, r in r2.items()}
    t4 = sum(A[v] for v, s in rows if s == "F")
    sa = sum(A[v] for v in vals)
    sa2 = sum(A[v] ** 2 for v in vals)
    n1 = sum(1 for _, s in rows if s == "F")
    n2 = N - n1
    e4 = n1 * sa / N
    var4 = n1 * n2 * (N * sa2 - sa * sa) / (N * N * (N - 1))
    got = all_queries()["squared_rank_dispersion_test"](spark, SF0001).collect()[0]
    assert (got["n_finished"], got["n_open"]) == (n1, n2)
    assert got["t4_stat"] == _fr(float(t4), 1)
    assert abs(got["z"] - (t4 - e4) / math.sqrt(var4)) < 1e-5


def test_jonckheere_terpstra_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(substr(o_orderpriority,1,1) AS INT),
                   CAST(round(o_totalprice*100,0) AS BIGINT)
            FROM '{SF0001}/orders.parquet'"""
    ).fetchall()
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    jt2 = 0
    ks = sorted(groups)
    for i_idx, gi in enumerate(ks):
        for gj in ks[i_idx + 1:]:
            for a in groups[gi]:
                for b_ in groups[gj]:
                    if a < b_:
                        jt2 += 2
                    elif a == b_:
                        jt2 += 1
    n = len(rows)
    sizes = [len(groups[g]) for g in ks]
    e2 = (n * n - sum(s * s for s in sizes)) // 2
    tie = Counter(v for _, v in rows)
    an = sum(s * (s - 1) * (2 * s + 5) for s in sizes)
    at = sum(t * (t - 1) * (2 * t + 5) for t in tie.values())
    bn = sum(s * (s - 1) * (s - 2) for s in sizes)
    bt = sum(t * (t - 1) * (t - 2) for t in tie.values())
    cn = sum(s * (s - 1) for s in sizes)
    ct = sum(t * (t - 1) for t in tie.values())
    var = (
        (n * (n - 1) * (2 * n + 5) - an - at) / 72.0
        + bn * bt / (36.0 * n * (n - 1) * (n - 2))
        + cn * ct / (8.0 * n * (n - 1))
    )
    z = (jt2 - e2) / math.sqrt(4.0 * var)
    got = all_queries()["jonckheere_terpstra_priority"](spark, SF0001).collect()[0]
    assert got["n"] == n and got["jt2"] == jt2 and got["e2"] == e2
    assert abs(got["z"] - z) < 1e-5


def test_revenue_randomness_panel_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, _ = _daily_cents()
    n = len(y)
    tp = sum(
        1
        for i in range(1, n - 1)
        if (y[i] > y[i - 1] and y[i] > y[i + 1])
        or (y[i] < y[i - 1] and y[i] < y[i + 1])
    )
    ds = sum(1 for i in range(1, n) if y[i] > y[i - 1])
    k0 = n // 2
    off = n - k0
    pairs = [(y[i], y[i + off]) for i in range(k0)]
    sp = sum(1 for a, b in pairs if b > a)
    k = sum(1 for a, b in pairs if b != a)
    got = {
        r["test"]: r
        for r in all_queries()["revenue_randomness_panel"](spark, SF0001).collect()
    }
    assert got["turning_points"]["stat"] == tp
    assert abs(
        got["turning_points"]["z"]
        - (tp - 2 * (n - 2) / 3) / math.sqrt((16 * n - 29) / 90)
    ) < 1e-5
    assert got["difference_sign"]["stat"] == ds
    assert abs(
        got["difference_sign"]["z"] - (ds - (n - 1) / 2) / math.sqrt((n + 1) / 12)
    ) < 1e-5
    assert got["cox_stuart"]["stat"] == sp
    assert abs(got["cox_stuart"]["z"] - (2 * sp - k) / math.sqrt(k)) < 1e-5


def test_bartels_rvn_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, _ = _daily_cents()
    n = len(y)
    r2map, _ = _mid_ranks(y)
    r = [r2map[v] for v in y]
    num4 = sum((r[i] - r[i + 1]) ** 2 for i in range(n - 1))
    den4 = sum((ri - (n + 1)) ** 2 for ri in r)
    rvn = num4 / den4
    var = 4 * (n - 2) * (5 * n * n - 2 * n - 9) / (5 * n * (n + 1) * (n - 1) ** 2)
    got = all_queries()["bartels_rank_vonneumann"](spark, SF0001).collect()[0]
    assert got["n_days"] == n
    assert got["rvn"] == _fr(rvn)
    assert abs(got["z"] - (rvn - 2) / math.sqrt(var)) < 1e-5


def test_durbin_watson_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, _ = _daily_cents()
    n = len(y)
    t = list(range(1, n + 1))
    tb, yb = sum(t) / n, sum(y) / n
    sxx = sum((ti - tb) ** 2 for ti in t)
    sxy = sum((ti - tb) * (yi - yb) for ti, yi in zip(t, y))
    b = sxy / sxx
    a = yb - b * tb
    e = [yi - a - b * ti for ti, yi in zip(t, y)]
    dw = sum((e[i] - e[i - 1]) ** 2 for i in range(1, n)) / sum(ei**2 for ei in e)
    got = all_queries()["durbin_watson_revenue"](spark, SF0001).collect()[0]
    assert got["n_days"] == n
    assert abs(got["dw"] - dw) < 1e-4
    assert abs(got["rho_hat"] - (1 - dw / 2)) < 1e-4


def test_weighted_logrank_panel_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""WITH pu AS (
              SELECT o_custkey, MIN(CAST(o_orderdate AS DATE)) f,
                     MAX(CAST(o_orderdate AS DATE)) l
              FROM '{SF0001}/orders.parquet' GROUP BY 1)
            SELECT CASE WHEN c.c_mktsegment='BUILDING' THEN 1 ELSE 0 END,
                   datediff('day', f, l),
                   CASE WHEN datediff('day', l, (SELECT MAX(l) FROM pu)) >= 90
                        THEN 1 ELSE 0 END
            FROM pu JOIN '{SF0001}/customer.parquet' c
              ON c.c_custkey = pu.o_custkey"""
    ).fetchall()
    N = len(rows)
    times = sorted({t for _, t, _ in rows})
    exp = {}
    for wname, wfun in (
        ("logrank", lambda nt: 1.0),
        ("gehan", lambda nt: nt / N),
        ("tarone_ware", lambda nt: math.sqrt(nt / N)),
    ):
        num_q = var_q = 0
        for t in times:
            at1 = sum(1 for g, tt, _ in rows if g == 1 and tt >= t)
            at = sum(1 for _, tt, _ in rows if tt >= t)
            d1 = sum(1 for g, tt, ch in rows if g == 1 and tt == t and ch)
            dt = sum(1 for _, tt, ch in rows if tt == t and ch)
            if dt == 0 or at < 2:
                continue
            w = wfun(at)
            oe = d1 - dt * (at1 / at)
            v = dt * (at1 / at) * (1 - at1 / at) * ((at - dt) / (at - 1))
            num_q += math.trunc(w * oe * 1e8)
            var_q += math.trunc(w * w * v * 1e8)
        exp[wname] = (num_q / 1e8, var_q / 1e8)
    got = {
        r["test"]: r
        for r in all_queries()["weighted_logrank_panel"](spark, SF0001).collect()
    }
    for wname, (numd, vard) in exp.items():
        assert got[wname]["weighted_o_minus_e"] == _fr(numd)
        assert got[wname]["weighted_var"] == _fr(vard)
        assert abs(got[wname]["z"] - numd / math.sqrt(vard)) < 1e-5


def test_rmst_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""WITH pu AS (
              SELECT user_id, MIN(CAST(ts AS DATE)) f, MAX(CAST(ts AS DATE)) l
              FROM '{SF0001}/events.parquet' GROUP BY 1)
            SELECT datediff('day', f, l),
                   CASE WHEN datediff('day', l, (SELECT MAX(l) FROM pu)) >= 7
                        THEN 1 ELSE 0 END
            FROM pu"""
    ).fetchall()
    N = len(rows)
    tau = 21
    rmst_q = 0
    s_tau_q = None
    for d in range(tau):
        cum = 0
        for t in sorted({tt for tt, _ in rows}):
            if t > d:
                break
            deaths = sum(1 for tt, ch in rows if tt == t and ch)
            at = sum(1 for tt, _ in rows if tt >= t)
            if deaths == 0:
                continue
            if deaths < at:
                cum += round(math.log((at - deaths) / at) * 1e8)
            else:
                cum += -1_000_000_000_000
        sq = math.trunc(math.exp(cum / 1e8) * 1e6)
        rmst_q += sq
        if d == tau - 1:
            s_tau_q = sq
    got = all_queries()["rmst_retention"](spark, SF0001).collect()[0]
    assert got["n_users"] == N and got["tau_days"] == tau
    assert got["rmst_days"] == rmst_q / 1e6
    assert got["s_at_horizon"] == s_tau_q / 1e6


def test_quandt_chow_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, days = _daily_cents()
    n = len(y)

    def sse(seg_t, seg_y):
        m = len(seg_t)
        tb, yb = sum(seg_t) / m, sum(seg_y) / m
        sxx = sum((t - tb) ** 2 for t in seg_t)
        sxy = sum((t - tb) * (v - yb) for t, v in zip(seg_t, seg_y))
        syy = sum((v - yb) ** 2 for v in seg_y)
        return syy - sxy * sxy / sxx

    t = list(range(1, n + 1))
    ssep = sse(t, y)
    best = None
    for k in range(math.ceil(n * 0.15), math.floor(n * 0.85) + 1):
        s1 = sse(t[:k], y[:k])
        s2 = sse(t[k:], y[k:])
        f = ((ssep - s1 - s2) / 2) / ((s1 + s2) / (n - 4))
        fq = _fr(f)
        if best is None or fq > best[0]:
            best = (fq, days[k - 1])
    got = all_queries()["quandt_chow_break"](spark, SF0001).collect()[0]
    assert got["n_days"] == n
    assert abs(got["sup_f"] - best[0]) < 1e-4
    assert got["break_day"] == best[1].strftime("%Y-%m-%d")


def test_brown_forsythe_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(trunc(value * 1000000) AS BIGINT)
            FROM '{SF0001}/events.parquet'"""
    ).fetchall()
    groups = defaultdict(list)
    for g, v in rows:
        groups[g].append(v)
    devs = {}
    for g, vs in groups.items():
        vs_sorted = sorted(vs)
        ng = len(vs)
        m2 = vs_sorted[(ng + 1) // 2 - 1] + vs_sorted[ng // 2]
        devs[g] = [abs(2 * v - m2) for v in vs]
    N = sum(len(v) for v in devs.values())
    k = len(devs)
    gs1 = sum(sum(v) for v in devs.values())
    gs2 = sum(sum(x * x for x in v) for v in devs.values())
    ssb_raw = 0.0
    for g in sorted(devs):
        s1 = sum(devs[g])
        ssb_raw += s1 * s1 / len(devs[g])
    gm = gs1 * gs1 / N
    ssb = ssb_raw - gm
    sst = gs2 - gm
    f = (ssb / (k - 1)) / ((sst - ssb) / (N - k))
    got = all_queries()["brown_forsythe_event_values"](spark, SF0001).collect()[0]
    assert (got["k_groups"], got["n"]) == (k, N)
    assert abs(got["f_stat"] - f) < 1e-4


def test_lexical_richness_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT lang, lower(trim(text)) FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    import re

    per_lang = defaultdict(Counter)
    for lang, txt in rows:
        per_lang[lang].update(re.split(r"\s+", txt))
    got = {
        r["lang"]: r
        for r in all_queries()["lexical_richness_panel"](spark, SF0001).collect()
    }
    assert set(got) == set(per_lang)
    for lang, cnt in per_lang.items():
        N = sum(cnt.values())
        V = len(cnt)
        spec = Counter(cnt.values())
        v1, v2 = spec.get(1, 0), spec.get(2, 0)
        sm2 = sum(m * m * vm for m, vm in spec.items())
        smm1 = sum(m * (m - 1) * vm for m, vm in spec.items())
        slnm = sum(vm * m * round(math.log(m) * 1e8) for m, vm in spec.items())
        qlnn = round(math.log(N) * 1e8)
        r = got[lang]
        assert r["n_tokens"] == N and r["vocab"] == V
        assert r["hapax_ratio"] == _fr(v1 / V)
        assert r["yule_k"] == _fr(10000.0 * (sm2 - N) / (N * N))
        assert r["guiraud_r"] == _fr(V / math.sqrt(N))
        assert r["sichel_s"] == _fr(v2 / V)
        assert r["simpson_d"] == _fr(smm1 / (N * (N - 1)))
        assert abs(r["shannon_h"] - (N * qlnn - slnm) / (N * 1e8)) < 2e-6


def test_brand_diversity_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT n.n_name, p.p_brand
            FROM '{SF0001}/lineitem.parquet' li
            JOIN '{SF0001}/part.parquet' p ON li.l_partkey = p.p_partkey
            JOIN '{SF0001}/supplier.parquet' s ON li.l_suppkey = s.s_suppkey
            JOIN '{SF0001}/nation.parquet' n ON s.s_nationkey = n.n_nationkey"""
    ).fetchall()
    per_nation = defaultdict(Counter)
    for nat, brand in rows:
        per_nation[nat][brand] += 1
    got = {
        r["nation"]: r
        for r in all_queries()["brand_diversity_by_nation"](spark, SF0001).collect()
    }
    assert set(got) == set(per_nation)
    for nat, cnt in per_nation.items():
        N = sum(cnt.values())
        rich = len(cnt)
        top = max(cnt.values())
        snn1 = sum(ni * (ni - 1) for ni in cnt.values())
        slnn = sum(ni * round(math.log(ni) * 1e8) for ni in cnt.values())
        qlnn = round(math.log(N) * 1e8)
        h = (N * qlnn - slnn) / (N * 1e8)
        r = got[nat]
        assert r["n_lineitems"] == N and r["brand_richness"] == rich
        assert r["simpson_index"] == _fr(snn1 / (N * (N - 1)))
        assert r["berger_parker"] == _fr(top / N)
        assert abs(r["shannon_h"] - h) < 2e-6
        assert abs(r["evenness"] - h / (round(math.log(rich) * 1e8) / 1e8)) < 2e-6


def test_theils_u_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT event_type, isodow(ts) FROM '{SF0001}/events.parquet'"
    ).fetchall()
    cells = Counter(rows)
    N = sum(cells.values())
    rowm = Counter()
    colm = Counter()
    for (t, d), c in cells.items():
        rowm[t] += c
        colm[d] += c

    def hs(counts):
        return N * round(math.log(N) * 1e8) - sum(
            c * round(math.log(c) * 1e8) for c in counts
        )

    hx, hy, hxy = hs(rowm.values()), hs(colm.values()), hs(cells.values())
    mi = hx + hy - hxy
    den = N * 1e8
    got = all_queries()["theils_u_event_dow"](spark, SF0001).collect()[0]
    assert got["n"] == N
    assert got["h_event_type"] == _fr(hx / den)
    assert got["mutual_info"] == _fr(mi / den)
    assert got["u_type_given_dow"] == _fr(mi / hx)
    assert got["u_dow_given_type"] == _fr(mi / hy)
    assert got["u_symmetric"] == _fr(2 * mi / (hx + hy))


def test_cohen_kappa_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    import re

    rows = duckdb.sql(
        f"SELECT n_chars, lower(trim(text)) FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    flags = [
        (1 if nc >= 300 else 0, 1 if len(re.split(r"\s+", tx)) >= 55 else 0)
        for nc, tx in rows
    ]
    N = len(flags)
    agree = sum(1 for a, b in flags if a == b)
    ra1 = sum(a for a, _ in flags)
    cb1 = sum(b for _, b in flags)
    chance = ra1 * cb1 + (N - ra1) * (N - cb1)
    kappa = (N * agree - chance) / (N * N - chance)
    got = all_queries()["cohen_kappa_quality_flags"](spark, SF0001).collect()[0]
    assert (got["n_docs"], got["n_agree"]) == (N, agree)
    assert got["kappa"] == _fr(kappa)
    assert got["raw_agreement"] == _fr(agree / N)


def test_page_hinkley_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, days = _daily_cents()
    u, s = 0, 0
    us = []
    for i, x in enumerate(y, start=1):
        s += x
        u += math.trunc((x - s / i) * 1e6)
        us.append(u)
    best_up = best_down = None
    run_min = run_max = None
    for d, ui in zip(days, us):
        run_min = ui if run_min is None else min(run_min, ui)
        run_max = ui if run_max is None else max(run_max, ui)
        up, down = ui - run_min, run_max - ui
        if best_up is None or up > best_up[1]:
            best_up = (d, up)
        if best_down is None or down > best_down[1]:
            best_down = (d, down)
    got = all_queries()["page_hinkley_drift"](spark, SF0001).collect()[0]
    assert got["n_days"] == len(y)
    assert got["day_up"] == best_up[0].strftime("%Y-%m-%d")
    assert got["ph_up_dollars"] == _fr(best_up[1] / 1e8, 4)
    assert got["day_down"] == best_down[0].strftime("%Y-%m-%d")
    assert got["ph_down_dollars"] == _fr(best_down[1] / 1e8, 4)


def test_brand_rank_agreement_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT r.r_name, p.p_brand,
                   SUM(CAST(trunc(li.l_extendedprice * (1 - li.l_discount) * 100)
                            AS BIGINT)) AS rev
            FROM '{SF0001}/lineitem.parquet' li
            JOIN '{SF0001}/part.parquet' p ON li.l_partkey = p.p_partkey
            JOIN '{SF0001}/supplier.parquet' s ON li.l_suppkey = s.s_suppkey
            JOIN '{SF0001}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
            JOIN '{SF0001}/region.parquet' r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name IN ('AMERICA', 'ASIA')
            GROUP BY 1, 2"""
    ).fetchall()
    per = defaultdict(dict)
    for rn, brand, rev in rows:
        per[rn][brand] = rev

    def ranks(d):
        return {
            b: i + 1
            for i, (b, _) in enumerate(
                sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))
            )
        }

    ra0, rb0 = ranks(per["AMERICA"]), ranks(per["ASIA"])
    common = sorted(set(ra0) & set(rb0))
    # densify ranks over the intersection
    ra = {b: i + 1 for i, b in enumerate(sorted(common, key=lambda b: ra0[b]))}
    rb = {b: i + 1 for i, b in enumerate(sorted(common, key=lambda b: rb0[b]))}
    n = len(common)
    foot = sum(abs(ra[b] - rb[b]) for b in common)
    sd2 = sum((ra[b] - rb[b]) ** 2 for b in common)
    disc = sum(
        1
        for i, b1 in enumerate(common)
        for b2 in common
        if ra[b1] < ra[b2] and rb[b1] > rb[b2]
    )
    got = all_queries()["brand_rank_agreement_regions"](spark, SF0001).collect()[0]
    assert got["n_brands"] == n and got["footrule"] == foot
    assert got["discordant_pairs"] == disc
    assert got["spearman_rho"] == _fr(1 - 6 * sd2 / (n**3 - n))
    assert got["kendall_tau"] == _fr(1 - 4 * disc / (n * (n - 1)))


def test_acf_panel_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    y, days = _daily_cents()
    n = len(y)
    s = sum(y)
    c = [n * yi - s for yi in y]
    den = sum(ci * ci for ci in c)
    expect = {}
    cum = 0.0
    by_day = dict(zip(days, c))
    import datetime

    for k in range(1, 15):
        num = sum(
            by_day[d] * by_day[d + datetime.timedelta(days=k)]
            for d in days
            if d + datetime.timedelta(days=k) in by_day
        )
        r = _fr(num / den)
        se_raw = math.sqrt((1.0 + 2.0 * cum) / n)
        expect[k] = (r, _fr(se_raw), abs(r) > _fr(1.96 * se_raw))
        cum += r * r
    got = {
        r["lag"]: (r["r"], r["bartlett_se"], r["significant"])
        for r in all_queries()["acf_panel_revenue"](spark, SF0001).collect()
    }
    assert got == expect
