"""Round-8 query families, pinned against pure-Python/numpy replays
and planted structure — the pytest layer under the oracle gate (which
certifies Spark↔DuckDB; these certify both against an independent
reference implementation)."""

from __future__ import annotations

import math
import re
from collections import defaultdict

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_spearman_matches_pandas_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS p
            FROM '{SF}/lineitem.parquet'"""
    ).df()
    rq = df["q"].rank(method="average")
    rp = df["p"].rank(method="average")
    ref = np.corrcoef(rq, rp)[0, 1]

    row = all_queries()["spearman_price_quantity"](spark, SF).collect()[0]
    assert row["n_rows"] == len(df)
    assert abs(row["rho_spearman"] - ref) <= 1e-6


def test_mannwhitney_matches_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT CAST(trunc(value * 1000000) AS BIGINT) AS v,
                   event_type = 'purchase' AS is_p
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('purchase', 'click')"""
    ).df()
    ranks = df["v"].rank(method="average")
    n1 = int(df["is_p"].sum())
    n2 = len(df) - n1
    r1 = float(ranks[df["is_p"]].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    # tie correction
    _, counts = np.unique(df["v"], return_counts=True)
    ties = float(np.sum(counts.astype(np.float64) ** 3 - counts))
    nn = n1 + n2
    sigma = math.sqrt(n1 * n2 / 12 * ((nn + 1) - ties / (nn * (nn - 1))))
    z = (u1 - n1 * n2 / 2) / sigma

    row = all_queries()["mannwhitney_event_values"](spark, SF).collect()[0]
    assert (row["n_purchase"], row["n_click"]) == (n1, n2)
    assert abs(row["u_stat"] - u1) <= 0.11
    assert abs(row["z_score"] - z) <= 1e-6
    assert abs(row["rank_biserial"] - (1 - 2 * u1 / (n1 * n2))) <= 1e-6


def test_pmi_collocations_matches_bruteforce(spark):
    from data_ingestion_project_spark.queries import all_queries

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n_docs = len(texts)
    dfc: dict = defaultdict(int)
    c12: dict = defaultdict(int)
    for t in texts:
        ws = sorted({w for w in re.split(r"\s+", (t or "").strip().lower()) if w})
        for w in ws:
            dfc[w] += 1
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                c12[(ws[i], ws[j])] += 1
    scored = sorted(
        (
            (
                round(math.log(n_docs * c / (dfc[w1] * dfc[w2])) * 10000) / 10000.0,
                w1,
                w2,
                c,
            )
            for (w1, w2), c in c12.items()
        ),
        key=lambda r: (-r[0], r[1], r[2]),
    )[:15]

    got = all_queries()["pmi_collocations"](spark, SF).collect()
    assert len(got) == 15
    for r, (pmi, w1, w2, c) in zip(got, scored):
        assert (r["w1"], r["w2"], r["c12"]) == (w1, w2, c)
        assert abs(r["pmi"] - pmi) <= 1.01e-4  # half-even vs half-up at 1e-4
        assert r["df1"] == dfc[w1] and r["df2"] == dfc[w2]


def test_stump_split_scan_finds_planted_separator(spark):
    """Planted structure: dim 0 separates the two labels perfectly
    (the only boundary between the -0.3 and +0.3 spikes; float32
    -0.3 buckets to floor(-6.0000002) = -7, threshold -0.3); dim 1
    is a constant and carries zero gain. The scan must report dim 0
    with the full parent impurity as gain — this is the densify
    regression test: at the separating boundary the right class has
    NO cumulative row, and a sparse join would drop the candidate."""
    from data_ingestion_project_spark.operators.stump import (
        histogram_cells,
        stump_split_gains,
    )

    rows = [([-0.3, 0.1], 0) for _ in range(100)] + [([0.3, 0.1], 1) for _ in range(100)]
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    gains = stump_split_gains(histogram_cells(df, "embedding", "label", scale=20))
    best = gains.orderBy(gains.gain.desc(), "dim", "b").first()
    assert best["dim"] == 0
    assert abs(best["threshold"] - (-0.3)) < 1e-9
    assert (best["n_left"], best["n_right"]) == (100, 100)
    assert abs(best["gain"] - 0.5) < 1e-12  # parent gini 0.5, children pure
    # dim 1 (constant) produces no valid candidate at all
    assert gains.filter("dim = 1").count() == 0


def test_decision_stump_splits_matches_numpy_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    emb = duckdb.sql(
        f"SELECT embedding, label FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    X = np.array([e for e, _ in emb], dtype=np.float64)
    y = np.array([l for _, l in emb])
    B = np.floor(X * 20).astype(np.int64)
    labels = np.unique(y)
    best = {}
    for d in range(X.shape[1]):
        tot = np.array([(y == c).sum() for c in labels], dtype=np.int64)
        nt = tot.sum()
        gp = nt - (tot.astype(np.float64) ** 2).sum() / nt
        for b in np.unique(B[:, d]):
            left = B[:, d] <= b
            nl_c = np.array([((y == c) & left).sum() for c in labels], dtype=np.int64)
            nl, nr = int(nl_c.sum()), int(nt - nl_c.sum())
            if nl == 0 or nr == 0:
                continue
            nr_c = tot - nl_c
            gw = (nl - (nl_c.astype(np.float64) ** 2).sum() / nl) + (
                nr - (nr_c.astype(np.float64) ** 2).sum() / nr
            )
            gain = (gp - gw) / nt
            if d not in best or (gain, -b) > (best[d][0], -best[d][1]):
                best[d] = (gain, int(b), nl, nr)
    top = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[:10]

    got = all_queries()["decision_stump_splits"](spark, SF).collect()
    assert len(got) == 10
    for r, (d, (gain, b, nl, nr)) in zip(got, top):
        assert r["dim"] == d
        assert abs(r["threshold"] - (b + 1) / 20.0) < 1e-9
        assert (r["n_left"], r["n_right"]) == (nl, nr)
        assert abs(r["gini_gain"] - gain) <= 1e-6


def test_hits_matches_python_power_iteration(spark):
    from data_ingestion_project_spark.operators.hits import hits

    edges = [(1, 10), (1, 11), (2, 10), (3, 10), (3, 12), (4, 13)]
    df = spark.createDataFrame(edges, "src long, dst long")
    hubs, auths = hits(df, iterations=5)
    got_a = {r["node"]: r["authority"] for r in auths.collect()}
    got_h = {r["node"]: r["hub"] for r in hubs.collect()}

    h = {c: 1.0 for c, _ in edges}
    a: dict = {}
    for _ in range(5):
        a_raw: dict = defaultdict(float)
        for c, s in edges:
            a_raw[s] += h[c]
        t = sum(a_raw.values())
        a = {s: round(v / t, 12) for s, v in a_raw.items()}
        h_raw: dict = defaultdict(float)
        for c, s in edges:
            h_raw[c] += a[s]
        t = sum(h_raw.values())
        h = {c: round(v / t, 12) for c, v in h_raw.items()}
    assert set(got_a) == set(a) and set(got_h) == set(h)
    for s in a:
        assert abs(got_a[s] - a[s]) <= 1e-9
    for c in h:
        assert abs(got_h[c] - h[c]) <= 1e-9
    # authority mass concentrates on the shared supplier 10
    assert max(a, key=a.get) == 10
    assert abs(sum(got_a.values()) - 1.0) < 1e-6


def test_cohort_ltv_matches_pandas_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    ev = duckdb.sql(
        f"""SELECT user_id, ts, event_type,
                   CAST(trunc(value * 1000000) AS BIGINT) AS v_mi
            FROM '{SF}/events.parquet'"""
    ).df()
    ev["ts"] = pd.to_datetime(ev["ts"])
    first = ev.groupby("user_id")["ts"].min().dt.to_period("W-SUN").dt.start_time
    sizes = first.value_counts()
    buys = ev[ev["event_type"] == "purchase"].copy()
    buys["cohort"] = buys["user_id"].map(first)
    buys["age"] = (
        (buys["ts"].dt.normalize() - buys["cohort"]).dt.days // 7
    ).astype(int)
    cells = (
        buys.groupby(["cohort", "age"])
        .agg(rev=("v_mi", "sum"), n=("v_mi", "size"))
        .reset_index()
        .sort_values(["cohort", "age"])
    )
    cells["cum"] = cells.groupby("cohort")["rev"].cumsum()

    got = all_queries()["cohort_ltv_curve"](spark, SF).collect()
    assert len(got) == len(cells)
    for r, (_, c) in zip(got, cells.iterrows()):
        assert r["cohort_week"] == c["cohort"].strftime("%Y-%m-%d")
        assert r["age_wk"] == c["age"]
        assert r["n_users"] == int(sizes[c["cohort"]])
        assert r["n_purchases"] == int(c["n"])
        assert abs(r["cum_revenue"] - c["cum"] / 1e6) <= 0.006
        assert (
            abs(r["ltv_per_user"] - c["cum"] / 1e6 / sizes[c["cohort"]]) <= 6e-5
        )


def test_kendall_tau_matches_pandas_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents,
                   COUNT(*) AS n
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()
    x, y = daily["cents"].to_numpy(), daily["n"].to_numpy()
    n = len(daily)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            sx = int(x[i] < x[j]) - int(x[i] > x[j])
            sy = int(y[i] < y[j]) - int(y[i] > y[j])
            if sx * sy == 1:
                c += 1
            elif sx * sy == -1:
                d += 1
            if sx == 0:
                tx += 1
            if sy == 0:
                ty += 1
    n0 = n * (n - 1) // 2
    tau = (c - d) / math.sqrt((n0 - tx) * (n0 - ty))

    row = all_queries()["kendall_tau_daily"](spark, SF).collect()[0]
    assert (row["n_days"], row["n_pairs"]) == (n, n0)
    assert (row["concordant"], row["discordant"]) == (c, d)
    assert abs(row["tau_b"] - tau) <= 1e-6


def test_supplier_herfindahl_matches_pandas_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    per = duckdb.sql(
        f"""SELECT n_name, s_suppkey,
                   SUM(CAST(trunc(l_extendedprice * (1 - l_discount) * 1000000)
                            AS BIGINT)) AS rev
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/supplier.parquet' s ON l_suppkey = s_suppkey
            JOIN '{SF}/nation.parquet' n ON n_nationkey = s_nationkey
            GROUP BY 1, 2"""
    ).df()
    got = {r["n_name"]: r for r in
           all_queries()["supplier_herfindahl_by_nation"](spark, SF).collect()}
    for name, grp in per.groupby("n_name"):
        rev = grp["rev"].to_numpy(dtype=np.float64)
        tot = float(rev.sum())
        hhi = float((rev ** 2).sum()) / (tot * tot)
        r = got[name]
        assert r["n_suppliers"] == len(grp)
        assert abs(r["hhi"] - hhi) <= 1e-6
        assert abs(r["top_share"] - rev.max() / tot) <= 1e-6
        assert abs(r["total_revenue"] - tot / 1e6) <= 0.006
    assert set(got) == set(per["n_name"])


def test_dau_wau_mau_matches_bruteforce(spark):
    from data_ingestion_project_spark.queries import all_queries

    ud = duckdb.sql(
        f"SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    by_day: dict = defaultdict(set)
    for day, u in ud:
        by_day[day].add(u)
    days = sorted(by_day)
    got = {r["day"]: r for r in
           all_queries()["dau_wau_mau_stickiness"](spark, SF).collect()}
    assert set(got) == {d.strftime("%Y-%m-%d") for d in days}
    import datetime as _dt

    for d in days:
        wau = set().union(*(by_day.get(d - _dt.timedelta(days=i), set())
                            for i in range(7)))
        mau = set().union(*(by_day.get(d - _dt.timedelta(days=i), set())
                            for i in range(30)))
        r = got[d.strftime("%Y-%m-%d")]
        assert r["dau"] == len(by_day[d])
        assert r["wau"] == len(wau)
        assert r["mau"] == len(mau)
        assert abs(r["stickiness"] - len(by_day[d]) / len(mau)) <= 1e-6


def test_order_interarrival_matches_pandas_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    o = duckdb.sql(
        f"""SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey
            FROM '{SF}/orders.parquet' ORDER BY o_custkey, d, o_orderkey"""
    ).df()
    gaps, custs = [], set()
    for _, grp in o.groupby("o_custkey"):
        ds = grp["d"].tolist()
        for a, b in zip(ds, ds[1:]):
            gaps.append((b - a).days)
        if len(ds) > 1:
            custs.add(grp["o_custkey"].iloc[0])
    gaps_np = np.array(gaps)
    row = all_queries()["order_interarrival_stats"](spark, SF).collect()[0]
    assert row["n_repeat_customers"] == len(custs)
    assert row["n_gaps"] == len(gaps)
    assert abs(row["mean_gap_days"] - gaps_np.mean()) <= 1e-4
    assert (row["min_gap"], row["max_gap"]) == (gaps_np.min(), gaps_np.max())
    assert abs(row["share_within_30d"] - (gaps_np <= 30).mean()) <= 1e-6
    assert abs(row["share_within_90d"] - (gaps_np <= 90).mean()) <= 1e-6


def test_simpson_paradox_audit_matches_pandas_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT p_brand, CAST(l_quantity AS BIGINT) AS x,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l_partkey = p_partkey"""
    ).df()

    def moments(g):
        n = len(g)
        sx, sy = int(g["x"].sum()), int(g["y"].sum())
        sxy = int((g["x"] * g["y"]).sum())
        sxx = int((g["x"] * g["x"]).sum())
        return n, n * sxy - sx * sy, n * sxx - sx * sx

    _, gnum, gden = moments(df)
    gslope = gnum / gden * 100.0
    rows = []
    for brand, g in df.groupby("p_brand"):
        n, num, den = moments(g)
        if (num > 0 and gnum < 0) or (num < 0 and gnum > 0):
            rows.append((brand, num / den * 100.0))
    rows.sort(key=lambda r: (-abs(r[1]), r[0]))

    got = all_queries()["simpson_paradox_audit"](spark, SF).collect()
    if not rows:
        assert got == []
        return
    r = got[0]
    assert r["n_brands"] == df["p_brand"].nunique()
    assert r["n_reversed"] == len(rows)
    assert abs(r["pooled_slope"] - gslope) <= 1e-6
    assert r["top_reversed_brand"] == rows[0][0]
    assert abs(r["top_reversed_slope"] - rows[0][1]) <= 1e-6


def test_entropy_rate_matches_python_replay(spark):
    """Replay the full pipeline in Python with the IDENTICAL
    quantization contract (p@1e-14, terms in nano-nats, pi via the
    rounded 20-step power iteration)."""
    from data_ingestion_project_spark.queries import all_queries

    trans = duckdb.sql(
        f"""SELECT prev AS src, event_type AS dst, COUNT(*) AS n FROM (
              SELECT event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM '{SF}/events.parquet') t
            WHERE prev IS NOT NULL GROUP BY 1, 2"""
    ).fetchall()
    tot: dict = defaultdict(int)
    for s, _d, n in trans:
        tot[s] += n
    p = {(s, d): round(n / tot[s], 14) for s, d, n in trans}
    states = sorted(tot)
    k = len(states)
    pi = {s: 1.0 / k for s in states}
    for _ in range(20):
        nxt: dict = defaultdict(float)
        for (s, d), pv in p.items():
            nxt[d] += round(pi[s] * pv, 14)
        pi = {d: round(v, 10) for d, v in nxt.items()}
    hs: dict = defaultdict(int)
    for (s, _d), pv in p.items():
        hs[s] += round(pv * math.log(pv) * 1e9)
    c = {s: round(pi[s] * float(-hs[s])) for s in states}
    rate = sum(c.values()) / 1e9

    got = {r["event_type"]: r for r in
           all_queries()["entropy_rate_markov"](spark, SF).collect()}
    assert set(got) == set(states)
    for s in states:
        r = got[s]
        assert abs(r["pi_stationary"] - pi[s]) <= 1e-9
        assert abs(r["h_state_nats"] - (-hs[s] / 1e9)) <= 1e-9
        assert abs(r["contribution_nats"] - c[s] / 1e9) <= 1e-9
        assert abs(r["entropy_rate_nats"] - rate) <= 1e-9
    # sanity: rate is a pi-weighted mean of the per-state entropies
    assert 0.0 < rate <= math.log(len(states)) + 1e-9


def test_readability_matches_python_replay(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    agg: dict = defaultdict(lambda: [0, 0, 0, 0])  # n, wps, spw, fl
    for lang, text in rows:
        low = (text or "").strip().lower()
        w = len([x for x in re.split(r"\s+", low) if x])
        if w == 0:
            continue
        s = max(1, len(re.findall(r"[.!?]+", text)))
        y = len(re.findall(r"[aeiouy]+", low))
        wps, spw = w / s, y / w
        fl = 206.835 - 1.015 * wps - 84.6 * spw
        a = agg[lang]
        a[0] += 1
        a[1] += int(wps * 1e6)
        a[2] += int(spw * 1e6)
        a[3] += int(fl * 1e6)
    got = {r["lang"]: r for r in
           all_queries()["text_readability_scores"](spark, SF).collect()}
    assert set(got) == set(agg)
    for lang, (n, s_wps, s_spw, s_fl) in agg.items():
        r = got[lang]
        assert r["n_docs"] == n
        assert abs(r["avg_words_per_sentence"] - s_wps / n / 1e6) <= 1.1e-4
        assert abs(r["avg_syllables_per_word"] - s_spw / n / 1e6) <= 1.1e-4
        assert abs(r["avg_flesch"] - s_fl / n / 1e6) <= 1.1e-4


def test_hits_rejects_zero_iterations(spark):
    """iterations=0 has no authority frame (round-8 ADVICE): both the
    operator and its SQL twin must refuse loudly instead of crashing
    with AttributeError / emitting SQL over nonexistent CTEs."""
    import pytest

    from data_ingestion_project_spark.operators.hits import hits, hits_unrolled_sql

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations >= 1"):
        hits(df, iterations=0)
    with pytest.raises(ValueError, match="iterations >= 1"):
        hits_unrolled_sql("edges", 0)


def test_stump_sql_dims_guard():
    """stump_sql(dims=) must fail loudly on a dimensionality mismatch
    instead of silently truncating/fabricating dimensions (round-8
    ADVICE), and reproduce the 64-dim gains byte-identically."""
    import duckdb
    import pytest

    from data_ingestion_project_spark.operators.stump import stump_sql

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT 1 AS label,"
        " [0.10, 0.20, 0.90]::FLOAT[] AS embedding"
        " UNION ALL SELECT 2, [0.80, 0.15, 0.05]::FLOAT[]"
    )
    ok = con.execute(
        f"WITH {stump_sql(scale=20, dims=3)} SELECT count(*) FROM gains"
    ).fetchone()[0]
    assert ok > 0
    with pytest.raises(duckdb.Error, match="dims"):
        con.execute(
            f"WITH {stump_sql(scale=20, dims=4)} SELECT count(*) FROM gains"
        ).fetchall()
