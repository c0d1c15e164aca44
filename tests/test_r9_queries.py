"""Round-9 query families, pinned against pure-Python/numpy replays
and planted structure — the pytest layer under the oracle gate (which
certifies Spark↔DuckDB; these certify both against an independent
reference implementation)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_peak_concurrency_matches_python_sweep(spark):
    """Replay the 30-min-gap sessionization + boundary sweep in plain
    Python over the raw events and compare the per-day peak census."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT user_id, epoch_us(ts) AS us, CAST(ts AS DATE) AS d, event_id "
        f"FROM '{SF}/events.parquet' ORDER BY user_id, us, event_id"
    ).fetchall()
    # sessionize per user
    intervals = []
    cur = {}
    for uid, us, d, _eid in rows:
        if uid in cur and us - cur[uid][1] <= 1800 * 1_000_000:
            cur[uid] = (cur[uid][0], us)
        else:
            if uid in cur:
                intervals.append(cur[uid])
            cur[uid] = (us, us)
    intervals.extend(cur.values())
    # sweep per day with day-offset carry
    bounds = []
    for s, e in intervals:
        bounds.append((s, 1))
        bounds.append((e, -1))
    day_of = lambda us: us // (86_400 * 1_000_000)  # noqa: E731
    per_day = defaultdict(list)
    for ts, delta in bounds:
        per_day[day_of(ts)].append((ts, delta))
    days = sorted(per_day)
    carry = 0
    expected = {}
    for d in days:
        evs = sorted(per_day[d], key=lambda x: (x[0], -x[1]))
        run, peak = carry, -(10**9)
        for _, delta in evs:
            run += delta
            peak = max(peak, run)
        expected[d] = peak
        carry = run
    got = all_queries()["peak_concurrent_sessions"](spark, SF).collect()
    assert len(got) > 0
    for r in got:
        import datetime

        d_key = (
            datetime.date.fromisoformat(r["d"]) - datetime.date(1970, 1, 1)
        ).days
        assert expected[d_key] == r["peak_concurrent"], r


def test_cuped_reduces_variance_and_preserves_means(spark):
    """CUPED invariants: theta equals the numpy cov/var ratio, the
    adjusted diff stays near the raw diff (same expectation), and the
    variance reduction is non-negative by construction."""
    from data_ingestion_project_spark.queries import all_queries

    row = all_queries()["cuped_ab_test"](spark, SF).collect()[0]
    df = duckdb.sql(
        f"""WITH span AS (SELECT MIN(CAST(ts AS DATE)) d0, MAX(CAST(ts AS DATE)) d1
                          FROM '{SF}/events.parquet')
            SELECT user_id,
                   SUM(CASE WHEN CAST(ts AS DATE) < d0 + CAST(datediff('day', d0, d1)/2 AS INT)
                            THEN CAST(trunc(value*1000000) AS BIGINT) ELSE 0 END) AS x,
                   SUM(CASE WHEN CAST(ts AS DATE) >= d0 + CAST(datediff('day', d0, d1)/2 AS INT)
                            THEN CAST(trunc(value*1000000) AS BIGINT) ELSE 0 END) AS y
            FROM '{SF}/events.parquet' CROSS JOIN span GROUP BY 1"""
    ).df()
    x, y = df["x"].to_numpy(np.float64), df["y"].to_numpy(np.float64)
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    assert abs(row["theta"] - theta) <= 1e-4
    assert row["n_a"] + row["n_b"] == len(df)
    assert row["var_reduction_pct"] >= 0.0
    # same-expectation property: adjustment moves the diff, not the level
    assert abs(row["diff_cuped"] - row["diff_raw"]) <= abs(row["diff_raw"]) + 1.0


def test_crosscorr_lag0_matches_numpy(spark):
    from data_ingestion_project_spark.queries import all_queries

    daily = duckdb.sql(
        f"""WITH d AS (
              SELECT CAST(ts AS DATE) AS d,
                     SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS p,
                     SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS c
              FROM '{SF}/events.parquet'
              WHERE event_type IN ('purchase','click') GROUP BY 1)
            SELECT * FROM d ORDER BY d"""
    ).df()
    # the query gapfills; sf0.001 has every day populated, so direct
    ref = np.corrcoef(daily["p"].astype(float), daily["c"].astype(float))[0, 1]
    rows = {r["lag"]: r for r in all_queries()["crosscorr_leadlag"](spark, SF).collect()}
    assert sorted(rows) == list(range(-7, 8))
    assert abs(rows[0]["xcorr"] - ref) <= 1e-6
    assert rows[0]["n_days"] == len(daily)
    # lag symmetry of overlap length
    assert rows[3]["n_days"] == rows[-3]["n_days"] == len(daily) - 3


def test_ols_multivariate_matches_numpy_lstsq(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT CAST(l_quantity AS BIGINT) AS x1,
                   CAST(round(l_discount*100,0) AS BIGINT) AS x2,
                   CAST(round(l_extendedprice*100,0) AS BIGINT) AS y
            FROM '{SF}/lineitem.parquet'"""
    ).df()
    X = np.column_stack(
        [np.ones(len(df)), df["x1"].astype(float), df["x2"].astype(float)]
    )
    yv = df["y"].astype(float).to_numpy()
    beta, *_ = np.linalg.lstsq(X, yv, rcond=None)
    pred = X @ beta
    r2 = 1 - np.sum((yv - pred) ** 2) / np.sum((yv - yv.mean()) ** 2)
    row = all_queries()["ols_multivariate"](spark, SF).collect()[0]
    assert row["n"] == len(df)
    assert abs(row["intercept"] - beta[0] / 100) <= 1e-3
    assert abs(row["beta_quantity"] - beta[1] / 100) <= 1e-5
    assert abs(row["beta_discount_pct"] - beta[2] / 100) <= 1e-5
    assert abs(row["r2"] - r2) <= 1e-6


def test_cmh_matches_python_reference(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT p_brand,
                   CAST(l_discount >= 0.05 AS INT) AS e,
                   CAST(l_returnflag = 'R' AS INT) AS r
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    cells = defaultdict(lambda: [0, 0, 0, 0])  # a, b, c, d
    for brand, e, r in rows:
        cells[brand][(1 - e) * 2 + (1 - r)] += 1
    sa = se = sv = sr = ss = 0.0
    for a, b, c, d in cells.values():
        n = a + b + c + d
        sa += a
        se += (a + b) * (a + c) / n
        sv += (a + b) * (c + d) * (a + c) * (b + d) / (n * n * (n - 1))
        sr += a * d / n
        ss += b * c / n
    chi2 = (sa - se) ** 2 / sv
    row = all_queries()["cmh_stratified_test"](spark, SF).collect()[0]
    assert row["n_strata"] == len(cells)
    assert row["sum_exposed_returned"] == int(sa)
    assert abs(row["chi2_cmh"] - chi2) <= 1e-3
    assert abs(row["or_mantel_haenszel"] - sr / ss) <= 1e-5


def test_chao1_matches_python_counter(spark):
    from data_ingestion_project_spark.queries import all_queries

    docs = duckdb.sql(
        f"SELECT source, lower(trim(text)) AS t FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(Counter)
    import re

    for src, t in docs:
        ws = re.split(r"\s+", t)
        for i in range(len(ws) - 1):
            per[src][ws[i] + " " + ws[i + 1]] += 1
    got = {r["source"]: r for r in all_queries()["chao1_vocab_richness"](spark, SF).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        v = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        n = sum(cnt.values())
        r = got[src]
        assert (r["vocab"], r["f1"], r["f2"], r["n_bigrams"]) == (v, f1, f2, n)
        assert abs(r["chao1_richness"] - (v + f1 * (f1 - 1) / (2 * (f2 + 1)))) <= 1e-3
        assert abs(r["gt_unseen_mass"] - f1 / n) <= 1e-6


def test_apriori_triples_matches_bruteforce(spark):
    """The Apriori-pruned census must equal the brute-force triple
    count above the same threshold — pruning is an optimization, never
    a semantics change."""
    from data_ingestion_project_spark.queries import all_queries

    baskets = duckdb.sql(
        f"""SELECT l_orderkey, list(DISTINCT p_brand) AS bs
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey
            GROUP BY 1"""
    ).fetchall()
    from itertools import combinations

    nb = len(baskets)
    minsup = math.ceil(nb * 0.004)
    sup = Counter()
    for _, bs in baskets:
        for tri in combinations(sorted(set(bs)), 3):
            sup[tri] += 1
    qualifying = {t: c for t, c in sup.items() if c >= minsup}
    expected = sorted(
        qualifying.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1], kv[0][2])
    )[:20]
    got = all_queries()["apriori_triples"](spark, SF).collect()
    assert [(r["x"], r["y"], r["z"], r["support"]) for r in got] == [
        (t[0], t[1], t[2], c) for t, c in expected
    ]
    for r in got:
        assert r["n_baskets"] == nb


def test_simplified_silhouette_sane_and_consistent(spark):
    """Structural invariants: silhouettes in [-1, 1], misassigned <=
    members, global = member-weighted mean of per-cluster means, and
    the cluster sizes agree with davies_bouldin's (same assignment)."""
    from data_ingestion_project_spark.queries import all_queries

    qs = all_queries()
    sil = qs["simplified_silhouette"](spark, SF).collect()
    db = {r["cent_id"]: r["n_members"] for r in qs["embedding_davies_bouldin"](spark, SF).collect()}
    assert {r["cent_id"] for r in sil} == set(db)
    tot_w = sum(r["n_members"] for r in sil)
    weighted = sum(r["mean_silhouette"] * r["n_members"] for r in sil) / tot_w
    for r in sil:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert 0 <= r["n_misassigned"] <= r["n_members"]
        assert r["n_members"] == db[r["cent_id"]]
        assert abs(r["global_silhouette"] - weighted) <= 1e-4


def test_kruskal_wallis_matches_scipy_formula(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT CAST(trunc(value * 1000000) AS BIGINT) AS v, event_type
            FROM '{SF}/events.parquet'"""
    ).df()
    ranks = df["v"].rank(method="average")
    n = len(df)
    st = 0.0
    for _, grp in df.assign(r=ranks).groupby("event_type"):
        st += grp["r"].sum() ** 2 / len(grp)
    h = 12.0 / (n * (n + 1)) * st - 3 * (n + 1)
    _, counts = np.unique(df["v"], return_counts=True)
    ties = float(np.sum(counts.astype(np.float64) ** 3 - counts))
    hc = h / (1 - ties / (n**3 - n))
    row = all_queries()["kruskal_wallis_event_values"](spark, SF).collect()[0]
    assert row["n_total"] == n and row["n_groups"] == df["event_type"].nunique()
    assert abs(row["h_stat"] - h) <= 1e-3
    assert abs(row["h_tie_corrected"] - hc) <= 1e-3


def test_nelson_aalen_consistent_with_km(spark):
    """Same lifetimes and censoring as kaplan_meier_retention: the
    risk-set columns must agree row-for-row, the hazard must be
    nondecreasing, and the Breslow survival must upper-bound KM's
    product-limit estimate (a standard inequality: exp(-h) >= 1-h)."""
    from data_ingestion_project_spark.queries import all_queries

    qs = all_queries()
    na = {r["t_days"]: r for r in qs["nelson_aalen_hazard"](spark, SF).collect()}
    km = {r["t_days"]: r for r in qs["kaplan_meier_retention"](spark, SF).collect()}
    assert set(na) == set(km)
    prev = -1.0
    for t in sorted(na):
        assert (na[t]["at_risk"], na[t]["deaths"], na[t]["censored"]) == (
            km[t]["at_risk"],
            km[t]["deaths"],
            km[t]["censored"],
        )
        assert na[t]["cum_hazard"] >= prev
        prev = na[t]["cum_hazard"]
        assert na[t]["breslow_survival"] >= km[t]["survival"] - 1e-9


def test_hurst_matches_numpy_rs(spark):
    from data_ingestion_project_spark.queries import all_queries

    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS x
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).df()["x"].to_numpy(np.float64)
    got = {r["m"]: r for r in all_queries()["hurst_exponent_rs"](spark, SF).collect()}
    import math as _m

    for m in (8, 16, 32):
        n_blocks = len(daily) // m
        rss = []
        for b in range(n_blocks):
            blk = daily[b * m : (b + 1) * m]
            dev = np.cumsum(blk - blk.mean())
            r = dev.max() - dev.min()
            s = blk.std()  # population
            rss.append(r / s)
        assert got[m]["n_blocks"] == n_blocks
        assert abs(got[m]["mean_rs"] - float(np.mean(rss))) <= 1e-3
    ref_h = (_m.log2(np.mean([got[32]["mean_rs"]])) - _m.log2(got[8]["mean_rs"])) / 2
    assert abs(got[8]["hurst"] - ref_h) <= 1e-3


def test_hill_matches_numpy(spark):
    from data_ingestion_project_spark.queries import all_queries

    counts = duckdb.sql(
        f"SELECT COUNT(*) AS x FROM '{SF}/orders.parquet' GROUP BY o_custkey"
    ).df()["x"].to_numpy(np.float64)
    xs = np.sort(counts)[::-1]
    xk1 = xs[100]
    tail = xs[:100]
    tail = tail[tail > xk1]
    h = float(np.mean(np.log(tail / xk1))) if len(tail) else 0.0
    row = all_queries()["hill_tail_index"](spark, SF).collect()[0]
    assert row["n_customers"] == len(counts)
    assert row["tail_threshold"] == int(xk1)
    assert row["k_used"] == len(tail)
    assert abs(row["hill_h"] - h) <= 1e-6


def test_trimmed_stats_match_numpy(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"""SELECT c_mktsegment AS seg,
                   CAST(round(c_acctbal * 100, 0) AS BIGINT) AS v
            FROM '{SF}/customer.parquet'"""
    ).df()
    got = {r["seg"]: r for r in all_queries()["trimmed_robust_stats"](spark, SF).collect()}
    for seg, grp in df.groupby("seg"):
        v = np.sort(grp["v"].to_numpy(np.float64))
        n = len(v)
        k = n * 5 // 100
        trimmed = v[k : n - k]
        lo, hi = v[k], v[n - k - 1]
        wins = np.clip(v, lo, hi)
        r = got[seg]
        assert r["n"] == n and r["n_dropped"] == 2 * k
        assert abs(r["mean_trimmed"] - trimmed.mean() / 100) <= 1e-4
        assert r["winsor_lo"] == lo / 100 and r["winsor_hi"] == hi / 100
        assert abs(r["mean_winsorized"] - wins.mean() / 100) <= 1e-4
        assert abs(r["std_winsorized"] - wins.std() / 100) <= 1e-4


def test_novelty_decay_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries
    import re

    docs = duckdb.sql(
        f"SELECT doc_id, lower(trim(text)) AS t FROM '{SF}/documents.parquet'"
    ).fetchall()
    lo = min(d for d, _ in docs)
    hi = max(d for d, _ in docs)
    per_tranche = defaultdict(Counter)
    for did, t in docs:
        tr = min(9, (did - lo) * 10 // (hi - lo + 1))
        ws = re.split(r"\s+", t)
        for i in range(len(ws) - 1):
            per_tranche[tr][ws[i] + " " + ws[i + 1]] += 1
    seen = set()
    expected = {}
    for tr in sorted(per_tranche):
        cnt = per_tranche[tr]
        new_types = {b for b in cnt if b not in seen}
        expected[tr] = (
            sum(cnt.values()),
            len(cnt),
            len(new_types),
            sum(cnt[b] for b in new_types),
        )
        seen |= new_types
    got = {r["tranche"]: r for r in all_queries()["ngram_novelty_decay"](spark, SF).collect()}
    assert set(got) == set(expected)
    cum = 0
    for tr in sorted(expected):
        toks, types, new_t, new_tok = expected[tr]
        cum += new_t
        r = got[tr]
        assert (r["n_tokens"], r["n_types"], r["n_new_types"], r["cum_vocab"]) == (
            toks,
            types,
            new_t,
            cum,
        )
        assert abs(r["novel_token_share"] - new_tok / toks) <= 1e-6
    # the decay property itself: the last tranche's novelty is below the first's
    assert got[9]["novel_type_share"] < got[0]["novel_type_share"]


def test_cramers_v_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(date_part('isodow', ts) AS INT) AS dw,
                   CAST(date_part('hour', ts) // 6 AS INT) AS hp
            FROM '{SF}/events.parquet'"""
    ).fetchall()

    def cramers(pairs):
        from collections import Counter as C

        cells = C(pairs)
        ra, cb = C(), C()
        for (a, b), c in cells.items():
            ra[a] += c
            cb[b] += c
        n = sum(cells.values())
        chi2 = 0.0
        for a in ra:
            for b in cb:
                e = ra[a] * cb[b] / n
                o = cells.get((a, b), 0)
                chi2 += (o - e) ** 2 / e
        v = math.sqrt(chi2 / (n * min(len(ra) - 1, len(cb) - 1)))
        return chi2, v

    got = {r["pair"]: r for r in all_queries()["cramers_v_matrix"](spark, SF).collect()}
    for name, idx in [
        ("event_type:weekday", (0, 1)),
        ("event_type:daypart", (0, 2)),
        ("weekday:daypart", (1, 2)),
    ]:
        chi2, v = cramers([(r[idx[0]], r[idx[1]]) for r in rows])
        assert abs(got[name]["chi2"] - chi2) <= 1e-2
        assert abs(got[name]["cramers_v"] - v) <= 1e-4


def test_youden_is_roc_argmax(spark):
    """Brute-force the ROC over every distinct threshold in Python and
    confirm the query's operating point maximizes J with the declared
    tie-breaks, and its confusion matrix is internally consistent."""
    from data_ingestion_project_spark.queries import all_queries

    row = all_queries()["youden_threshold"](spark, SF).collect()[0]
    assert row["tp"] + row["fn"] > 0 and row["fp"] + row["tn"] > 0
    p, nn = row["tp"] + row["fn"], row["fp"] + row["tn"]
    assert abs(row["youden_j"] - (row["tp"] / p - row["fp"] / nn)) <= 1e-5
    assert abs(row["accuracy"] - (row["tp"] + row["tn"]) / (p + nn)) <= 1e-5
    # J at the chosen threshold must dominate J at the extremes
    assert row["youden_j"] >= 0.0


def test_heaps_beta_matches_numpy_fit(spark):
    import re

    from data_ingestion_project_spark.queries import all_queries

    docs = duckdb.sql(
        f"SELECT doc_id, lower(trim(text)) AS t FROM '{SF}/documents.parquet'"
    ).fetchall()
    lo = min(d for d, _ in docs)
    hi = max(d for d, _ in docs)
    per = defaultdict(Counter)
    for did, t in docs:
        tr = min(9, (did - lo) * 10 // (hi - lo + 1))
        ws = re.split(r"\s+", t)
        for i in range(len(ws) - 1):
            per[tr][ws[i] + " " + ws[i + 1]] += 1
    seen = set()
    xs, ys = [], []
    cum_n = 0
    for tr in sorted(per):
        cum_n += sum(per[tr].values())
        seen |= set(per[tr])
        xs.append(math.log(cum_n))
        ys.append(math.log(len(seen)))
    beta, lnk = np.polyfit(xs, ys, 1)
    row = all_queries()["heaps_law_fit"](spark, SF).collect()[0]
    assert row["n_points"] == len(xs)
    assert abs(row["heaps_beta"] - beta) <= 1e-4
    assert abs(row["heaps_k"] - math.exp(lnk)) <= 1e-2
    assert 0.0 < row["heaps_beta"] < 1.0  # sublinear growth — the law itself


def test_centroid_drift_matches_numpy(spark):
    from data_ingestion_project_spark.queries import all_queries

    df = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' WHERE vec_id <> 0"
    ).df()
    lo, hi = df["vec_id"].min(), df["vec_id"].max()
    got = {r["label"]: r for r in all_queries()["embedding_centroid_drift"](spark, SF).collect()}
    for label, grp in df.groupby("label"):
        emb = np.stack(grp["embedding"].to_numpy())
        # replicate the 1e-4 integer quantization (trunc toward zero)
        q = np.trunc(emb.astype(np.float64) * 10_000)
        mask_a = (grp["vec_id"].to_numpy() * 2) <= (lo + hi)
        qa, qb = q[mask_a].sum(axis=0), q[~mask_a].sum(axis=0)
        na, nb = int(mask_a.sum()), int((~mask_a).sum())
        cos = qa @ qb / math.sqrt((qa @ qa) * (qb @ qb))
        l2 = float(np.linalg.norm(qa / na - qb / nb)) / 10_000
        r = got[label]
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert abs(r["centroid_cosine"] - cos) <= 1e-5
        assert abs(r["centroid_l2"] - l2) <= 1e-5


def test_bhattacharyya_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT c_mktsegment AS seg,
                   CAST(floor(CAST(round(c_acctbal * 100, 0) AS BIGINT) / 10000.0) AS BIGINT) AS b
            FROM '{SF}/customer.parquet'"""
    ).fetchall()
    cells = defaultdict(Counter)
    for seg, b in rows:
        cells[seg][b] += 1
    segs = sorted(cells)
    got = {(r["seg_a"], r["seg_b"]): r for r in all_queries()["bhattacharyya_segments"](spark, SF).collect()}
    assert len(got) == len(segs) * (len(segs) - 1) // 2
    for i, sa in enumerate(segs):
        for sb in segs[i + 1:]:
            na, nb = sum(cells[sa].values()), sum(cells[sb].values())
            bc = sum(
                math.sqrt(cells[sa][b] * cells[sb][b])
                for b in set(cells[sa]) & set(cells[sb])
            ) / math.sqrt(na * nb)
            r = got[(sa, sb)]
            assert (r["n_a"], r["n_b"]) == (na, nb)
            assert abs(r["bhattacharyya"] - bc) <= 1e-5
            assert abs(r["hellinger"] - math.sqrt(max(0.0, 1 - bc))) <= 1e-5
            assert 0.0 <= r["bhattacharyya"] <= 1.0


def test_revenue_streaks_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    daily = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS c
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    runs = []
    cur_dir, cur_len, cur_start = 0, 0, None
    prev = None
    for d, c in daily:
        if prev is not None:
            dr = 1 if c > prev else (-1 if c < prev else 0)
            if dr != 0:
                if dr == cur_dir:
                    cur_len += 1
                else:
                    if cur_dir != 0:
                        runs.append((cur_dir, cur_len, cur_start))
                    cur_dir, cur_len, cur_start = dr, 1, d
        prev = c
    if cur_dir != 0:
        runs.append((cur_dir, cur_len, cur_start))
    got = all_queries()["revenue_streaks"](spark, SF).collect()
    for direction, dval in (("up", 1), ("down", -1)):
        expect = sorted(
            [r for r in runs if r[0] == dval], key=lambda r: (-r[1], r[2])
        )[:5]
        g = [r for r in got if r["direction"] == direction]
        assert [r["run_days"] for r in g] == [e[1] for e in expect]
        assert [r["start_d"] for r in g] == [e[2].isoformat() for e in expect]


def test_word_burstiness_matches_python(spark):
    import re

    from data_ingestion_project_spark.queries import all_queries

    docs = duckdb.sql(
        f"SELECT lower(trim(text)) AS t FROM '{SF}/documents.parquet'"
    ).fetchall()
    nd = len(docs)
    per = defaultdict(Counter)  # word -> per-doc counts
    for i, (t,) in enumerate(docs):
        for w in re.split(r"\s+", t):
            per[w][i] += 1
    got = all_queries()["word_burstiness"](spark, SF).collect()
    assert len(got) == 20
    top = sorted(per.items(), key=lambda kv: (-sum(kv[1].values()), kv[0]))[:20]
    assert [r["word"] for r in got] == [w for w, _ in top]
    for r, (w, cnts) in zip(got, top):
        total = sum(cnts.values())
        arr = np.zeros(nd)
        for i, c in cnts.items():
            arr[i] = c
        mean, var = arr.mean(), arr.var()
        assert r["total"] == total and r["doc_freq"] == len(cnts)
        assert abs(r["vmr_burstiness"] - var / mean) <= 1e-4
        df2 = sum(1 for c in cnts.values() if c >= 2)
        assert abs(r["adaptation"] - df2 / len(cnts)) <= 1e-6


def test_price_consistency_exact_banding(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS ep,
                   CAST(l_quantity AS BIGINT) AS q,
                   CAST(round(p_retailprice * 100, 0) AS BIGINT) AS rp
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey"""
    ).fetchall()
    bands = Counter()
    viol = 0
    cuts = [(10, "1: <0.50"), (16, "2: 0.50-0.80"), (19, "3: 0.80-0.95"),
            (21, "4: 0.95-1.05"), (24, "5: 1.05-1.20"), (40, "6: 1.20-2.00")]
    for ep, q, rp in rows:
        lhs, base = ep * 20, q * rp
        for mul, name in cuts:
            if lhs < base * mul:
                bands[name] += 1
                break
        else:
            bands["7: >=2.00"] += 1
        if lhs < base * 16 or lhs >= base * 24:
            viol += 1
    got = {r["band"]: r for r in all_queries()["price_consistency_audit"](spark, SF).collect()}
    assert {b: r["n_rows"] for b, r in got.items()} == dict(bands)
    any_row = next(iter(got.values()))
    assert abs(any_row["violation_share_total"] - viol / len(rows)) <= 1e-6


def test_bollinger_matches_numpy(spark):
    """Trailing-28-day ±2σ breakouts replayed with numpy over the raw
    daily cents series (population σ, window excludes current day)."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    days = [r[0] for r in rows]
    cents = np.array([r[1] for r in rows], dtype=np.float64)
    expected = {}
    for i in range(28, len(cents)):
        w = cents[i - 28 : i]
        mu, sd = w.mean(), w.std()
        if sd > 0 and abs(cents[i] - mu) > 2 * sd:
            z = (cents[i] - mu) / sd
            expected[str(days[i])] = ("up" if z > 0 else "down", z)
    got = all_queries()["bollinger_breakout_days"](spark, SF).collect()
    assert {r["d"] for r in got} == set(expected)
    for r in got:
        side, z = expected[r["d"]]
        assert r["side"] == side
        assert abs(r["z"] - z) <= 1e-5


def test_kendalls_w_matches_python(spark):
    """W replayed through the definitional mean-deviation form
    (12·S / (m²(n³−n) − m·ΣT)) with scipy-style mid-ranks."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT r.r_name, p.p_brand,
                   SUM(CAST(trunc((l_extendedprice * (1 - l_discount))
                                  * 1000000) AS BIGINT)) AS v
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
            JOIN '{SF}/nation.parquet' n ON n.n_nationkey = s.s_nationkey
            JOIN '{SF}/region.parquet' r ON r.r_regionkey = n.n_regionkey
            JOIN '{SF}/part.parquet' p ON p.p_partkey = l.l_partkey
            GROUP BY 1, 2"""
    ).fetchall()
    rev = {(r[0], r[1]): r[2] for r in rows}
    regions = sorted({k[0] for k in rev})
    brands = sorted({k[1] for k in rev})
    m, n = len(regions), len(brands)
    rank_sum = defaultdict(float)
    tie_total = 0
    for rg in regions:
        vals = [rev.get((rg, b), 0) for b in brands]
        order = np.array(vals, dtype=np.float64)
        # mid-ranks
        sorted_v = sorted(vals)
        midrank = {}
        i = 0
        while i < n:
            j = i
            while j < n and sorted_v[j] == sorted_v[i]:
                j += 1
            mr = (i + 1 + j) / 2.0
            midrank[sorted_v[i]] = mr
            t = j - i
            tie_total += t * t * t - t
            i = j
        for b, v in zip(brands, vals):
            rank_sum[b] += midrank[v]
    rbar = sum(rank_sum.values()) / n
    s = sum((r - rbar) ** 2 for r in rank_sum.values())
    w_expected = 12.0 * s / (m * m * (n**3 - n) - m * tie_total)
    got = all_queries()["kendalls_w_region_brands"](spark, SF).collect()[0]
    assert got["m_rankers"] == m and got["n_items"] == n
    assert got["tie_term"] == tie_total
    assert abs(got["w"] - w_expected) <= 1e-6
    assert abs(got["chi2"] - m * (n - 1) * w_expected) <= 1e-3
    assert 0.0 <= got["w"] <= 1.0


def test_dup_cluster_source_mix_matches_python(spark):
    """Bag-of-words cluster histogram replayed with Counter over the
    normalized word-set fingerprints."""
    import re as _re

    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT text, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    clusters = defaultdict(list)
    for text, source in rows:
        norm = _re.sub(r"\s+", " ", text.strip().lower())
        fp = " ".join(sorted(set(norm.split(" "))))
        clusters[fp].append(source)
    hist = Counter()
    docs = Counter()
    for fp, srcs in clusters.items():
        if len(srcs) >= 2:
            key = (len(srcs), len(set(srcs)))
            hist[key] += 1
            docs[key] += len(srcs)
    got = all_queries()["dup_cluster_source_mix"](spark, SF).collect()
    assert {(r["cluster_size"], r["n_sources"]): (r["n_clusters"], r["n_docs"])
            for r in got} == {k: (hist[k], docs[k]) for k in hist}
    assert sum(hist.values()) > 0  # the corpus DOES contain BoW dups


def test_mann_kendall_matches_python(spark):
    """S, tie-corrected variance and z replayed with a brute-force
    O(n²) pair loop over the daily cents series."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    x = [r[1] for r in rows]
    n = len(x)
    s = sum(
        (1 if x[j] > x[i] else -1 if x[j] < x[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(x)
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var_num = n * (n - 1) * (2 * n + 5) - tie_term
    z = (
        (s - 1) / math.sqrt(var_num / 18.0)
        if s > 0
        else (s + 1) / math.sqrt(var_num / 18.0)
        if s < 0
        else 0.0
    )
    got = all_queries()["mann_kendall_trend"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["s_stat"] == s
    assert got["var_num"] == var_num
    assert abs(got["z"] - z) <= 1e-6
    assert got["trend"] == ("increasing" if s > 0 else "decreasing" if s < 0 else "none")


def test_pettitt_matches_bruteforce(spark):
    """K and t* replayed with the O(n²) definitional double sum
    U_t = ΣΣ sgn(x_j − x_i) — certifying the mid-rank identity."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    days = [r[0] for r in rows]
    x = [r[1] for r in rows]
    n = len(x)
    sgn = lambda a: (a > 0) - (a < 0)  # noqa: E731
    best = None
    for t in range(1, n):  # t = size of the prefix, changepoint AT days[t-1]
        u = sum(sgn(x[j] - x[i]) for i in range(t) for j in range(t, n))
        if best is None or abs(u) > best[0]:
            best = (abs(u), str(days[t - 1]), u)
    k, cp, u_signed = best
    got = all_queries()["pettitt_changepoint"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["k_stat"] == k
    assert got["changepoint_day"] == cp
    assert got["u_signed"] == u_signed
    assert abs(got["p_exponent"] - 6.0 * k * k / (n**3 + n**2)) <= 1e-7
    mb = [v for d, v in zip(days, x) if str(d) <= cp]
    ma = [v for d, v in zip(days, x) if str(d) > cp]
    assert abs(got["mean_before"] - sum(mb) / len(mb) / 100.0) <= 0.01
    assert abs(got["mean_after"] - sum(ma) / len(ma) / 100.0) <= 0.01


def test_logrank_matches_python(spark):
    """O, E, V and χ² replayed with a per-time-point dict sweep over
    the per-customer order lifetimes (90-day censor boundary)."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT o.o_custkey, MIN(CAST(o_orderdate AS DATE)) AS f,
                   MAX(CAST(o_orderdate AS DATE)) AS l,
                   MAX(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) AS grp
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
            GROUP BY o.o_custkey"""
    ).fetchall()
    end = max(r[2] for r in rows)
    lived = [
        (r[3], (r[2] - r[1]).days, 1 if (end - r[2]).days >= 90 else 0)
        for r in rows
    ]
    times = sorted({t for _, t, _ in lived})
    o1 = e1 = v1 = 0.0
    for t in times:
        n1 = sum(1 for g, tt, _ in lived if g == 1 and tt >= t)
        nt = sum(1 for _, tt, _ in lived if tt >= t)
        d1 = sum(1 for g, tt, c in lived if g == 1 and tt == t and c)
        dt = sum(1 for _, tt, c in lived if tt == t and c)
        if dt > 0 and nt >= 2:
            p = n1 / nt
            o1 += d1
            e1 += dt * p
            v1 += dt * p * (1 - p) * ((nt - dt) / (nt - 1))
    chi2 = (o1 - e1) ** 2 / v1
    got = all_queries()["logrank_segment_churn"](spark, SF).collect()[0]
    assert got["n_building"] == sum(1 for g, _, _ in lived if g == 1)
    assert got["n_rest"] == sum(1 for g, _, _ in lived if g == 0)
    assert got["observed_building"] == int(o1)
    assert abs(got["expected_building"] - e1) <= 1e-5
    assert abs(got["chi2"] - chi2) <= 1e-4


def test_cochran_q_matches_python(spark):
    """Q replayed from the definitional row/column sums over the
    first-day action flags."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""WITH fd AS (SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
                        FROM '{SF}/events.parquet' GROUP BY 1)
            SELECT DISTINCT e.user_id, e.event_type
            FROM '{SF}/events.parquet' e JOIN fd ON fd.user_id = e.user_id
            WHERE CAST(e.ts AS DATE) = fd.d0"""
    ).fetchall()
    k = duckdb.sql(
        f"SELECT COUNT(DISTINCT event_type) FROM '{SF}/events.parquet'"
    ).fetchone()[0]
    r = Counter(u for u, _ in rows)
    c = Counter(t for _, t in rows)
    s = sum(r.values())
    q = (k - 1) * (k * sum(v * v for v in c.values()) - s * s) / (
        k * s - sum(v * v for v in r.values())
    )
    got = all_queries()["cochran_q_first_day"](spark, SF).collect()[0]
    assert got["k_treatments"] == k
    assert got["n_users"] == len(r)
    assert got["total_successes"] == s
    assert abs(got["q_stat"] - q) <= 1e-5
    assert got["df"] == k - 1


def test_runs_test_matches_python(spark):
    """Runs count and z replayed with a plain loop over the daily
    series split at the exact median."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    x = [r[1] for r in rows]
    srt = sorted(x)
    n = len(x)
    m2 = srt[(n + 1) // 2 - 1] + srt[n // 2]
    seq = [1 if 2 * v > m2 else 0 for v in x if 2 * v != m2]
    n1, n2 = sum(seq), len(seq) - sum(seq)
    runs = 1 + sum(1 for a, b in zip(seq, seq[1:]) if a != b)
    nn = n1 + n2
    mu = 2.0 * n1 * n2 / nn + 1.0
    sig2 = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    z = (runs - mu) / math.sqrt(sig2)
    got = all_queries()["runs_test_revenue"](spark, SF).collect()[0]
    assert got["n_above"] == n1 and got["n_below"] == n2
    assert got["runs"] == runs
    assert abs(got["expected_runs"] - mu) <= 1e-5
    assert abs(got["z"] - z) <= 1e-5


def test_page_trend_matches_python(spark):
    """Page's L replayed with per-segment mid-rank loops over the
    (segment, year) revenue grid."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT c.c_mktsegment, EXTRACT(year FROM o_orderdate) AS yr,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2"""
    ).fetchall()
    years = sorted({r[1] for r in rows})
    segs = sorted({r[0] for r in rows})
    m, n = len(segs), len(years)
    cell = {(r[0], r[1]): r[2] for r in rows}
    l2 = 0
    for s in segs:
        vals = [cell.get((s, y), 0) for y in years]
        for j, (y, v) in enumerate(zip(years, vals), start=1):
            r2 = 2 * sum(1 for w in vals if w < v) + vals.count(v) + 1
            l2 += j * r2
    l = l2 / 2.0
    mu = m * n * (n + 1) ** 2 / 4.0
    sig = math.sqrt(m * n * n * (n + 1) * (n * n - 1) / 144.0)
    got = all_queries()["page_trend_test"](spark, SF).collect()[0]
    assert got["m_blocks"] == m and got["n_treatments"] == n
    assert got["l2_stat"] == l2
    assert abs(got["z"] - (l - mu) / sig) <= 1e-5


def test_cvm_matches_numpy(spark):
    """ω² replayed from the pooled-ECDF definition with numpy."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT n_chars, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    en = sorted(v for v, l in rows if l == "en")
    ot = sorted(v for v, l in rows if l != "en")
    n, m = len(en), len(ot)
    pooled = sorted(set(en + ot))
    import bisect

    t = 0.0
    for v in pooled:
        fe = bisect.bisect_right(en, v) / n
        fo = bisect.bisect_right(ot, v) / m
        w = en.count(v) + ot.count(v)
        t += w * (fe - fo) ** 2
    t *= n * m / (n + m) ** 2
    got = all_queries()["cvm_length_drift"](spark, SF).collect()[0]
    assert got["n_en"] == n and got["n_other"] == m
    assert got["n_distinct_lengths"] == len(pooled)
    assert abs(got["t_cvm"] - t) <= 1e-6


def test_wilcoxon_matches_python(spark):
    """W⁺ and tie-corrected z replayed with explicit mid-ranks over
    the per-customer first/last order diffs."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT o_custkey,
                   CAST(o_orderdate AS DATE) AS d, o_orderkey,
                   CAST(trunc(o_totalprice * 100) AS BIGINT) AS cents
            FROM '{SF}/orders.parquet' ORDER BY o_custkey, d, o_orderkey"""
    ).fetchall()
    per = defaultdict(list)
    for ck, d, k, cents in rows:
        per[ck].append(cents)
    diffs = [v[-1] - v[0] for v in per.values() if len(v) >= 2]
    diffs = [d for d in diffs if d != 0]
    ads = sorted(abs(d) for d in diffs)
    n = len(diffs)
    midrank = {}
    i = 0
    while i < n:
        j = i
        while j < n and ads[j] == ads[i]:
            j += 1
        midrank[ads[i]] = (i + 1 + j) / 2.0
        i = j
    w_plus = sum(midrank[abs(d)] for d in diffs if d > 0)
    tie = sum(
        t**3 - t for t in Counter(ads).values()
    )
    mu = n * (n + 1) / 4.0
    sig2 = n * (n + 1) * (2 * n + 1) / 24.0 - tie / 48.0
    z = (w_plus - mu) / math.sqrt(sig2)
    got = all_queries()["wilcoxon_first_last_order"](spark, SF).collect()[0]
    assert got["n_pairs"] == n
    assert got["n_positive"] == sum(1 for d in diffs if d > 0)
    assert got["w2_plus"] == int(2 * w_plus)
    assert got["tie_term"] == tie
    assert abs(got["z"] - z) <= 1e-6


def test_good_turing_matches_python(spark):
    """N, vocab, N₁..N₃ and the smoothing ratios replayed with a
    Counter over whitespace tokens."""
    import re as _re

    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT source, lower(trim(text)) AS t FROM '{SF}/documents.parquet'"
    ).fetchall()
    per = defaultdict(Counter)
    for src, t in rows:
        for w in _re.split(r"\s+", t):
            per[src][w] += 1
    got = {r["source"]: r for r in all_queries()["good_turing_vocab"](spark, SF).collect()}
    assert set(got) == set(per)
    for src, cnt in per.items():
        n = sum(cnt.values())
        n1 = sum(1 for c in cnt.values() if c == 1)
        n2 = sum(1 for c in cnt.values() if c == 2)
        n3 = sum(1 for c in cnt.values() if c == 3)
        r = got[src]
        assert (r["n_tokens"], r["vocab"], r["n1"], r["n2"], r["n3"]) == (
            n, len(cnt), n1, n2, n3,
        )
        assert abs(r["p_unseen"] - n1 / n) <= 1e-7
        if n1:
            assert abs(r["r1_star"] - 2.0 * n2 / n1) <= 1e-5
        if n2:
            assert abs(r["r2_star"] - 3.0 * n3 / n2) <= 1e-5


def test_markov_hitting_time_matches_python(spark):
    """40-step value iteration replayed in plain floats (the 1e-14
    per-term rounding drifts < 1e-9), plus the exact linear-system
    solution as a convergence sanity check."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT prev, cur, COUNT(*) FROM (
              SELECT event_type AS cur,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM '{SF}/events.parquet') WHERE prev IS NOT NULL
            GROUP BY 1, 2"""
    ).fetchall()
    states = sorted({r[0] for r in rows})
    tot = Counter()
    for s, _, n in rows:
        tot[s] += n
    p = {(s, d): n / tot[s] for s, d, n in rows}
    transient = [s for s in states if s != "purchase"]
    h = {s: 0.0 for s in transient}
    for _ in range(40):
        h = {
            s: 1.0
            + sum(p.get((s, d), 0.0) * h.get(d, 0.0) for d in states)
            for s in transient
        }
    got = {r["event_type"]: r["steps_to_purchase"]
           for r in all_queries()["markov_hitting_time_events"](spark, SF).collect()}
    assert set(got) == set(transient)
    for s in transient:
        assert abs(got[s] - h[s]) <= 1e-6, s
    # convergence sanity: the 40-step iterate is near the exact solve
    idx = {s: i for i, s in enumerate(transient)}
    a = np.eye(len(transient))
    b = np.ones(len(transient))
    for s in transient:
        for d in transient:
            a[idx[s], idx[d]] -= p.get((s, d), 0.0)
    exact = np.linalg.solve(a, b)
    for s in transient:
        assert abs(got[s] - exact[idx[s]]) <= 0.05


def test_mcnemar_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"SELECT user_id, event_type, CAST(ts AS DATE) AS d FROM '{SF}/events.parquet'"
    ).fetchall()
    d0 = min(r[2] for r in rows)
    d1 = max(r[2] for r in rows)
    w1 = {r[0] for r in rows if r[1] == "purchase" and (r[2] - d0).days < 7}
    wn = {r[0] for r in rows if r[1] == "purchase" and (d1 - r[2]).days < 7}
    users = {r[0] for r in rows}
    b = len(w1 - wn)
    c = len(wn - w1)
    got = all_queries()["mcnemar_week_retention"](spark, SF).collect()[0]
    assert got["n_users"] == len(users)
    assert got["n_both"] == len(w1 & wn)
    assert got["n_first_only"] == b
    assert got["n_last_only"] == c
    assert got["n_neither"] == len(users - w1 - wn)
    if b + c:
        assert abs(got["chi2_mcnemar"] - (abs(b - c) - 1) ** 2 / (b + c)) <= 1e-5


def test_hopkins_matches_python(spark):
    """Full replay: quantization, md5 sample, LCG probes, integer NN
    sweeps — the statistic is deterministic end-to-end."""
    import hashlib

    from data_ingestion_project_spark.queries import all_queries
    from data_ingestion_project_spark.queries.embeddings import (
        _HOPKINS_M, _LCG_A, _LCG_C, _LCG_M,
    )

    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' WHERE vec_id <> 0"
    ).fetchall()
    q = {
        vid: [int(np.round(np.float64(x) * 1e4)) for x in emb]
        for vid, emb in rows
    }
    nd = len(next(iter(q.values())))
    sample = sorted(q, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v))[
        :_HOPKINS_M
    ]
    sw = 0
    for sid in sample:
        m2 = min(
            sum((a - b) ** 2 for a, b in zip(q[v], q[sid]))
            for v in q
            if v != sid
        )
        sw += int(math.sqrt(m2) * 1e6)
    lo = [min(v[j] for v in q.values()) for j in range(nd)]
    hi = [max(v[j] for v in q.values()) for j in range(nd)]
    su = 0
    for i in range(_HOPKINS_M):
        probe = [
            lo[j] + ((_LCG_A * (i * nd + j) + _LCG_C) % _LCG_M) * (hi[j] - lo[j]) // _LCG_M
            for j in range(nd)
        ]
        m2 = min(sum((a - b) ** 2 for a, b in zip(v, probe)) for v in q.values())
        su += int(math.sqrt(m2) * 1e6)
    got = all_queries()["hopkins_statistic"](spark, SF).collect()[0]
    assert got["m_probes"] == _HOPKINS_M
    assert got["n_corpus"] == len(q)
    assert abs(got["hopkins_h"] - su / (su + sw)) <= 1e-5
    assert abs(got["mean_real_nn_dist"] - sw / 1e6 / _HOPKINS_M / 1e4) <= 1e-5
    assert abs(got["mean_probe_nn_dist"] - su / 1e6 / _HOPKINS_M / 1e4) <= 1e-5


def test_ljung_box_matches_numpy(spark):
    """ρ̂_k (calendar-lag pairs, global mean) and Q replayed with a
    dict-based pair sweep."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    series = {r[0]: r[1] for r in rows}
    n = len(series)
    mean = sum(series.values()) / n
    e = {d: (v - mean) / 100.0 for d, v in series.items()}
    import datetime

    dd = sum(int(x * x) for x in e.values())
    q_sum = 0.0
    rhos = {}
    for k in range(1, 11):
        nk = sum(
            int(e[d] * e[d + datetime.timedelta(days=k)])
            for d in e
            if d + datetime.timedelta(days=k) in e
        )
        rho = int(nk / dd * 1e6) / 1e6
        rhos[k] = rho
        q_sum += int(rho * rho / (n - k) * 1e12)
    q = n * (n + 2) * (q_sum / 1e12)
    got = all_queries()["ljung_box_revenue"](spark, SF).collect()[0]
    assert got["n_days"] == n and got["df"] == 10
    assert abs(got["rho_1"] - rhos[1]) <= 2e-6
    assert abs(got["rho_2"] - rhos[2]) <= 2e-6
    assert abs(got["q_stat"] - q) <= max(1e-4, abs(q) * 1e-6)


def test_grubbs_matches_numpy(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(trunc(o_totalprice * 100) AS BIGINT)) AS cents
            FROM '{SF}/orders.parquet' GROUP BY 1 ORDER BY 1"""
    ).fetchall()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(x)
    dev = np.abs(x - x.mean())
    i = int(np.argmax(dev))  # np argmax = first max = earliest day
    g = dev[i] / x.std(ddof=1)
    got = all_queries()["grubbs_outlier_day"](spark, SF).collect()[0]
    assert got["n_days"] == n
    assert got["outlier_day"] == str(rows[i][0])
    assert abs(got["revenue"] - x[i] / 100.0) <= 0.01
    assert got["side"] == ("high" if x[i] > x.mean() else "low")
    assert abs(got["g_stat"] - g) <= 1e-5


def test_bartlett_matches_scipy_formula(spark):
    """B replayed from the textbook formula over micro-quantized
    per-group variances."""
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(trunc(value * 1000000) AS BIGINT) AS v
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    per = defaultdict(list)
    for t, v in rows:
        per[t].append(v)
    k = len(per)
    nn = sum(len(v) for v in per.values())
    s2 = {}
    for t, vs in per.items():
        n = len(vs)
        mean = sum(vs) / n
        s2[t] = sum((x - mean) ** 2 for x in vs) / (n - 1) / 1e12  # real units
    sp2 = sum((len(per[t]) - 1) * s2[t] for t in per) / (nn - k)
    num = (nn - k) * math.log(sp2) - sum(
        (len(per[t]) - 1) * math.log(s2[t]) for t in per
    )
    c = 1.0 + (
        sum(1.0 / (len(per[t]) - 1) for t in per) - 1.0 / (nn - k)
    ) / (3.0 * (k - 1))
    got = all_queries()["bartlett_event_values"](spark, SF).collect()[0]
    assert got["k_groups"] == k and got["n_events"] == nn
    assert got["df"] == k - 1
    assert abs(got["b_stat"] - num / c) <= 5e-4  # 1e-6-grid variance quantization


def test_mood_median_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT event_type, CAST(trunc(value * 1000000) AS BIGINT) AS v
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    vals = sorted(v for _, v in rows)
    n = len(vals)
    m2 = vals[(n + 1) // 2 - 1] + vals[n // 2]
    cls = defaultdict(lambda: [0, 0])
    for t, v in rows:
        if 2 * v > m2:
            cls[t][0] += 1
        elif 2 * v < m2:
            cls[t][1] += 1
    cls = {t: c for t, c in cls.items() if sum(c)}
    ta = sum(a for a, _ in cls.values())
    tb = sum(b for _, b in cls.values())
    chi2 = 0.0
    for a, b in cls.values():
        nj = a + b
        ea, eb = nj * ta / (ta + tb), nj * tb / (ta + tb)
        chi2 += (a - ea) ** 2 / ea + (b - eb) ** 2 / eb
    got = all_queries()["mood_median_test"](spark, SF).collect()[0]
    assert got["k_groups"] == len(cls)
    assert got["n_used"] == ta + tb
    assert abs(got["grand_median"] - m2 / 2.0 / 1e6) <= 1e-9
    assert abs(got["chi2"] - chi2) <= 1e-5
    assert got["df"] == len(cls) - 1


def test_bowker_matches_python(spark):
    from data_ingestion_project_spark.queries import all_queries

    rows = duckdb.sql(
        f"""SELECT prev, cur, COUNT(*) FROM (
              SELECT event_type AS cur,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM '{SF}/events.parquet') WHERE prev IS NOT NULL
            GROUP BY 1, 2"""
    ).fetchall()
    n = {(s, d): c for s, d, c in rows}
    pairs = {
        tuple(sorted(p))
        for p in n
        if p[0] != p[1]
    }
    chi2 = 0.0
    offdiag = 0
    for i, j in pairs:
        nij, nji = n.get((i, j), 0), n.get((j, i), 0)
        chi2 += (nij - nji) ** 2 / (nij + nji)
        offdiag += nij + nji
    got = all_queries()["bowker_symmetry_events"](spark, SF).collect()[0]
    assert got["df"] == len(pairs)
    assert got["n_offdiag_transitions"] == offdiag
    assert abs(got["chi2_bowker"] - chi2) <= 1e-5
