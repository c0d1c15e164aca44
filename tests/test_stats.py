"""Semantic + plan-shape tests for the statistics censuses
(queries/stats.py).  Semantics are checked against independent pandas
reference computations at sf0.001; plan pins assert the single-shuffle
sufficient-statistics posture that makes these queries 100 TB-safe."""

from __future__ import annotations

import math

import pandas as pd

from data_ingestion_project_spark.plans.explain import executed_plan, plan_census
from data_ingestion_project_spark.queries.stats import (
    anova_event_values,
    chisq_event_dow,
    ks_length_drift,
    mi_label_dims,
    regr_price_quantity,
)

SF = "/root/testdata/sf0.001"


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/events.parquet")


def test_chisq_matches_reference_computation(spark):
    """χ² cells and total against a straightforward pandas contingency
    computation (tolerance = the documented 1e-6 quantization)."""
    out = chisq_event_dow(spark, SF).toPandas()
    e = _events_pdf()
    e["dow"] = pd.to_datetime(e["ts"]).dt.dayofweek + 1  # ISO 1=Mon
    obs = e.groupby(["event_type", "dow"]).size()
    n = len(e)
    rt = e.groupby("event_type").size()
    ct = e.groupby("dow").size()
    chi2 = 0.0
    for (t, d), o in obs.items():
        exp = rt[t] * ct[d] / n
        chi2 += (o - exp) ** 2 / exp
    assert abs(out["chi2"].iloc[0] - chi2) < 1e-3
    assert out["dof"].iloc[0] == (obs.index.get_level_values(0).nunique() - 1) * (
        obs.index.get_level_values(1).nunique() - 1
    )
    # per-cell expected counts reproduce
    row = out[(out.event_type == out.event_type.iloc[0])].iloc[0]
    exp0 = rt[row.event_type] * ct[row.dow] / n
    assert abs(row.expected - exp0) < 1e-3


def test_anova_matches_reference_computation(spark):
    out = anova_event_values(spark, SF).toPandas()
    e = _events_pdf()
    groups = [g["value"].to_numpy() for _, g in e.groupby("event_type")]
    k = len(groups)
    n = len(e)
    grand = e["value"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(out["f_stat"].iloc[0] - f) < 1e-2
    assert out["df_between"].iloc[0] == k - 1
    assert out["df_within"].iloc[0] == n - k
    for _, r in out.iterrows():
        g = e[e.event_type == r.event_type]["value"]
        assert abs(r.mean_value - g.mean()) < 1e-4
        assert abs(r.var_value - g.var(ddof=1)) < 1e-3


def test_ks_matches_reference_computation(spark):
    out = ks_length_drift(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    en = d[d.lang == "en"]["n_chars"].to_numpy()
    ot = d[d.lang != "en"]["n_chars"].to_numpy()
    vals = sorted(set(d["n_chars"]))
    ks = max(
        abs((en <= v).mean() - (ot <= v).mean()) for v in vals
    )
    assert abs(out.ks_d - ks) < 1e-5
    assert out.n_en == len(en) and out.n_other == len(ot)
    crit = 1.358 * math.sqrt((len(en) + len(ot)) / (len(en) * len(ot)))
    assert abs(out.crit_05 - crit) < 1e-5
    assert out.reject_h0 == int(out.ks_d > out.crit_05)


def test_regr_matches_reference_computation(spark):
    out = regr_price_quantity(spark, SF).toPandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    for _, r in out.iterrows():
        g = li[li.l_returnflag == r.l_returnflag]
        x, y = g["l_quantity"].to_numpy(), g["l_extendedprice"].to_numpy()
        n = len(x)
        num = n * (x * y).sum() - x.sum() * y.sum()
        denx = n * (x * x).sum() - x.sum() ** 2
        deny = n * (y * y).sum() - y.sum() ** 2
        slope = num / denx
        assert abs(r.slope - slope) < 1e-3
        assert abs(r.intercept - (y.sum() - slope * x.sum()) / n) < 1e-2
        assert abs(r.r2 - num * num / (denx * deny)) < 1e-4


def test_mi_matches_reference_computation(spark):
    out = mi_label_dims(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = pd.DataFrame(emb["embedding"].tolist())
    n = len(emb)
    labels = emb["label"]

    def mi(dim: int) -> float:
        b = (mat[dim] > 0).astype(int)
        total = 0.0
        for bv in (0, 1):
            for lv in labels.unique():
                c = ((b == bv) & (labels == lv)).sum()
                if c == 0:
                    continue
                cb = (b == bv).sum()
                cl = (labels == lv).sum()
                total += (c / n) * math.log(c * n / (cb * cl))
        return total

    # top-1 dim's MI reproduces within the ln-quantization tolerance
    top = out.iloc[0]
    assert abs(top.mi - mi(int(top.dim))) < 1e-3
    # returned MIs are sorted descending
    assert list(out.mi) == sorted(out.mi, reverse=True)
    assert len(out) == 10


# ------------------------------------------------------------- plans


def test_chisq_scans_events_once(spark):
    """The contingency table and every derived total must come from ONE
    fact pass: the cell frame is checkpointed, so the returned plan
    reads the materialized 35-cell RDD — zero parquet scans of events
    remain in the query plan itself."""
    df = chisq_event_dow(spark, SF)
    plan = executed_plan(df)
    assert plan.count("FileScan parquet") == 0
    assert "ExistingRDD" in plan


def test_regr_is_single_shuffle_moment_agg(spark):
    """The REGR_* family: one partial-agg exchange for the moment sums;
    no join, no window, nothing corpus-sized after the agg."""
    df = regr_price_quantity(spark, SF)
    c = plan_census(df)
    assert c["n_exchanges"] <= 2  # partial->final agg + 3-row output sort
    plan = executed_plan(df)
    assert "Window" not in plan and "Join" not in plan


def test_ks_value_frame_window_is_partitioned(spark):
    """The two-level cumsum: the per-value window must be partitioned by
    bucket; the only single-partition step is the bucket-partials
    prefix (dimension-sized)."""
    df = ks_length_drift(spark, SF)
    # final AQE plan only (executed_plan also dumps the pre-AQE initial
    # plan, which would double every node count)
    plan = executed_plan(df).split("== Initial Plan ==")[0]
    # allowed single-partition steps: the ~|lengths|/64-row bucket
    # prefix window + the 1-row totals aggregate — never the value frame
    assert plan.count("Exchange SinglePartition") <= 2
    assert "hashpartitioning(bkt" in plan  # per-value window keyed by bucket
    assert plan.count("FileScan parquet") == 0  # per-length frame checkpointed


def test_mi_shuffle_is_cell_sized(spark):
    """After posexplode, partial aggregation must combine map-side: the
    exchange carries (dim, sign, label) cells, so the plan has hash
    aggregates around every exchange and no corpus-sized sort."""
    df = mi_label_dims(spark, SF)
    c = plan_census(df)
    assert c["n_broadcast_joins"] >= 2  # cb, cl marginal joins
    assert c["n_bnl_joins"] <= 1  # the 1-row n_total crossJoin
    assert c["n_sortmerge_joins"] == 0
    # the 64x explode ran once, into the checkpointed cell grid
    assert executed_plan(df).count("FileScan parquet") == 0


def test_welch_matches_reference_computation(spark):
    from data_ingestion_project_spark.queries.stats import welch_event_values

    out = welch_event_values(spark, SF).toPandas().iloc[0]
    e = _events_pdf()
    a = e[e.event_type == "purchase"]["value"].to_numpy()
    b = e[e.event_type == "click"]["value"].to_numpy()
    va, vb = a.var(ddof=1), b.var(ddof=1)
    na, nb = len(a), len(b)
    se2 = va / na + vb / nb
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert out.n_purchase == na and out.n_click == nb
    assert abs(out.t_stat - t) < 1e-4
    assert abs(out.df_welch - df) < 1e-1
    assert abs(out.mean_purchase - a.mean()) < 1e-4
    assert abs(out.var_click - vb) < 1e-3


def test_skew_audit_matches_reference_computation(spark):
    from data_ingestion_project_spark.queries.stats import join_key_skew_audit

    out = join_key_skew_audit(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = o.groupby("o_custkey").size()
    T = c.sum()
    p = c / T
    entropy = -(p * p.map(math.log)).sum()
    assert out.n_keys == len(c) and out.n_rows == T
    assert abs(out.entropy - entropy) < 1e-3
    assert abs(out.norm_entropy - entropy / math.log(len(c))) < 1e-3
    assert abs(out.hhi - (p * p).sum()) < 1e-6
    assert abs(out.max_key_share - c.max() / T) < 1e-6
    # a uniform key would give norm_entropy 1.0; sanity bound
    assert 0.0 < out.norm_entropy <= 1.0


def test_seasonality_matches_reference_computation(spark):
    from data_ingestion_project_spark.queries.stats import revenue_seasonality

    out = revenue_seasonality(spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.floor("D")
    daily = o.groupby("day")["o_totalprice"].sum().reset_index(name="rev")
    daily["month"] = daily["day"].dt.to_period("M")
    daily["dow"] = daily["day"].dt.dayofweek + 1
    mavg = daily.groupby("month")["rev"].transform("mean")
    daily["dev"] = daily["rev"] - mavg
    seas = daily.groupby("dow")["dev"].mean()
    resid = daily["dev"] - daily["dow"].map(seas)
    r2 = 1 - resid.var(ddof=1) / daily["dev"].var(ddof=1)
    assert len(out) == 7
    for _, row in out.iterrows():
        assert abs(row.seasonal - seas[row.dow]) < 1e-2
    assert abs(out.weekly_r2.iloc[0] - r2) < 1e-3


def test_welch_and_skew_are_single_pass(spark):
    """Both audits must be chained aggregations: no joins, no windows,
    and for Welch a pushed event_type filter on the scan."""
    from data_ingestion_project_spark.queries.stats import (
        join_key_skew_audit,
        welch_event_values,
    )

    for q in (welch_event_values, join_key_skew_audit):
        plan = executed_plan(q(spark, SF)).split("== Initial Plan ==")[0]
        assert "Join" not in plan and "Window" not in plan
    c = plan_census(welch_event_values(spark, SF))
    assert c["n_exchanges"] <= 1  # scalar final aggregate only


def test_seasonality_has_no_windows_and_no_fact_rescans(spark):
    """Trend = month-mean join, seasonal = dow aggregate: the whole
    decomposition is joins/aggregates over the checkpointed per-day
    frame — zero windows, zero parquet scans in the returned plan."""
    from data_ingestion_project_spark.queries.stats import revenue_seasonality

    plan = executed_plan(revenue_seasonality(spark, SF))
    assert "Window" not in plan
    assert plan.count("FileScan parquet") == 0


def test_kmv_set_similarity_accuracy_floor(spark):
    """Sketch Jaccard/union/intersection estimates vs the EXACT weekly
    self-join ground truth (k=256; determinism is certified by the
    DuckDB oracle — this pins that the estimates are also CLOSE)."""
    from data_ingestion_project_spark.queries.advanced import kmv_set_similarity

    est = kmv_set_similarity(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["wk"] = pd.to_datetime(e["ts"]).dt.to_period("W").dt.start_time.dt.strftime(
        "%Y-%m-%d"
    )
    sets = {w: set(g["user_id"]) for w, g in e.groupby("wk")}
    assert len(est) == len(sets) * (len(sets) - 1) // 2
    for _, r in est.iterrows():
        a, b = sets[r.week_a], sets[r.week_b]
        exact_j = len(a & b) / len(a | b)
        assert abs(r.est_jaccard - exact_j) < 0.12
        assert abs(r.est_union_users - len(a | b)) / len(a | b) < 0.15
        assert abs(r.est_common_users - len(a & b)) / max(len(a & b), 1) < 0.25


def test_psi_matches_reference_computation(spark):
    """PSI against a direct pandas computation with the same Laplace
    smoothing and bucket width."""
    from data_ingestion_project_spark.queries.stats import psi_length_drift

    out = psi_length_drift(spark, SF).toPandas()
    d = pd.read_parquet(f"{SF}/documents.parquet")
    d["bkt"] = d["n_chars"] // 64
    en = d[d.lang == "en"].groupby("bkt").size()
    ot = d[d.lang != "en"].groupby("bkt").size()
    bkts = sorted(set(d["bkt"]))
    B = len(bkts)
    psi = 0.0
    for b in bkts:
        p = (en.get(b, 0) + 1) / (len(d[d.lang == "en"]) + B)
        q = (ot.get(b, 0) + 1) / (len(d[d.lang != "en"]) + B)
        psi += (p - q) * math.log(p / q)
    assert abs(out["psi"].iloc[0] - psi) < 1e-4
    assert len(out) == B
    # per-bucket contributions sum (within quantization) to the index
    assert abs(out["contrib"].sum() - out["psi"].iloc[0]) < 1e-4 * B


def test_abc_classes_match_reference_and_plan(spark):
    """ABC classification against a pandas weighted-cumsum reference;
    plan: the only single-partition step is the bucket-prefix frame."""
    from data_ingestion_project_spark.queries.advanced import abc_customer_classes

    out = abc_customer_classes(spark, SF).toPandas().set_index("abc_class")
    o = pd.read_parquet(f"{SF}/orders.parquet")
    rev = o.groupby("o_custkey")["o_totalprice"].sum().sort_values(ascending=False)
    cum = rev.cumsum() / rev.sum()
    cls = cum.map(lambda c: "A" if c <= 0.80 else ("B" if c <= 0.95 else "C"))
    for c in ("A", "B", "C"):
        assert out.loc[c, "n_customers"] == (cls == c).sum()
        assert abs(out.loc[c, "revenue_share"] - rev[cls == c].sum() / rev.sum()) < 1e-4
    assert out["revenue_share"].sum() > 0.999
    plan = executed_plan(abc_customer_classes(spark, SF)).split("== Initial Plan ==")[0]
    assert plan.count("Exchange SinglePartition") <= 2  # bucket prefix + 1-row total
    assert "hashpartitioning(bkt" in plan


def test_jsd_matches_reference_and_properties(spark):
    """KL/JSD against a pandas reference; JSD bounded by ln 2 and
    symmetric-by-construction."""
    from data_ingestion_project_spark.queries.stats import jsd_source_vocab

    out = jsd_source_vocab(spark, SF).toPandas().iloc[0]
    d = pd.read_parquet(f"{SF}/documents.parquet")
    import re as _re

    def words(df):
        c = {}
        for t in df["text"]:
            for w in _re.split(r"\s+", t.lower().strip()):
                c[w] = c.get(w, 0) + 1
        return c

    ca = words(d[d.source == "src0"])
    cb = words(d[d.source != "src0"])
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    kl_ab = kl_ba = jsd = 0.0
    for w in vocab:
        p = (ca.get(w, 0) + 1) / (na + v)
        q = (cb.get(w, 0) + 1) / (nb + v)
        m = (p + q) / 2
        kl_ab += p * math.log(p / q)
        kl_ba += q * math.log(q / p)
        jsd += 0.5 * (p * math.log(p / m) + q * math.log(q / m))
    assert out.vocab_size == v
    assert abs(out.kl_src0_other - kl_ab) < 1e-3
    assert abs(out.kl_other_src0 - kl_ba) < 1e-3
    assert abs(out.jsd - jsd) < 1e-3
    assert 0 <= out.jsd <= math.log(2) + 1e-9


def test_funnel_matches_reference_computation(spark):
    """Strict sequence-match funnel vs a per-user pandas replay."""
    from data_ingestion_project_spark.queries.advanced import ordered_funnel_7d

    out = ordered_funnel_7d(spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet").sort_values(["user_id", "ts", "event_id"])
    week = pd.Timedelta(days=7)
    n_sig = n_click = n_purch = 0
    for _, g in e.groupby("user_id"):
        sigs = g[g.event_type == "signup"]["ts"]
        if sigs.empty:
            continue
        n_sig += 1
        s_first = None
        c1 = s1 = None
        for _, row in g.iterrows():
            if row.event_type == "signup":
                s_first = row.ts if s_first is None else min(s_first, row.ts)
            elif row.event_type == "click" and s_first is not None and c1 is None:
                # (ts, event_id) ROW-order tie-break, matching the
                # window frame (ROWS ... 1 PRECEDING): a click sharing
                # its signup's timestamp qualifies when its row sorts
                # AFTER the signup — s_first is set iff the signup row
                # already iterated, so no strict ts > s_first test.
                if row.ts <= s_first + week:
                    c1, s1 = row.ts, s_first
        if c1 is None:
            continue
        n_click += 1
        p = g[(g.event_type == "purchase") & (g.ts > c1) & (g.ts <= s1 + week)]
        if len(p):
            n_purch += 1
    assert out.n_signup_users == n_sig
    assert out.n_click_conv == n_click
    assert out.n_purchase_conv == n_purch


def test_funnel_timestamp_tie_semantics(spark, tmp_path):
    """Pins the (ts, event_id) ROW-order tie-break on timestamp ties,
    the case the corpus never exercises: a click sharing its signup's
    timestamp qualifies iff its event_id sorts AFTER the signup's —
    the ROWS ... 1 PRECEDING frame sees the signup only then.  Both
    engines (window frame here, DuckDB oracle) share this semantics;
    this fixture keeps any future reformulation honest."""
    from data_ingestion_project_spark.queries.advanced import ordered_funnel_7d

    t0 = pd.Timestamp("2024-03-01 12:00:00")
    rows = [
        # user 1: signup/click TIE, click's event_id higher → click row
        # follows the signup row → qualifies; purchase converts.
        (1, t0, 1, "signup"),
        (2, t0, 1, "click"),
        (3, t0 + pd.Timedelta(hours=1), 1, "purchase"),
        # user 2: same tie REVERSED (click's event_id lower) → the
        # click row precedes its signup → no prior signup → no conv.
        (4, t0, 2, "click"),
        (5, t0, 2, "signup"),
        (6, t0 + pd.Timedelta(hours=1), 2, "purchase"),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    pdf["value"] = 1.0
    pdf["props"] = "{}"
    pdf.to_parquet(tmp_path / "events.parquet", index=False)
    out = ordered_funnel_7d(spark, str(tmp_path)).toPandas().iloc[0]
    assert out.n_signup_users == 2
    assert out.n_click_conv == 1
    assert out.n_purchase_conv == 1


def test_benford_matches_reference_computation(spark):
    from data_ingestion_project_spark.queries.stats import benford_order_totals

    out = benford_order_totals(spark, SF).toPandas()
    o = pd.read_parquet(f"{SF}/orders.parquet")
    digits = o["o_totalprice"].astype(int).astype(str).str[0].astype(int)
    n = len(o)
    chi2 = 0.0
    for d in range(1, 10):
        obs = (digits == d).sum()
        exp = math.log10(1 + 1 / d) * n
        chi2 += (obs - exp) ** 2 / exp
        row = out[out.digit == d]
        if len(row):
            assert row.observed.iloc[0] == obs
            assert abs(row.expected.iloc[0] - exp) < 0.1  # ln-literal quantization
    assert abs(out.chi2.iloc[0] - chi2) < max(1.0, chi2 * 1e-3)


def test_residual_autocorr_matches_reference(spark):
    from data_ingestion_project_spark.queries.stats import residual_autocorr

    out = residual_autocorr(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["day"] = pd.to_datetime(o["o_orderdate"]).dt.floor("D")
    daily = o.groupby("day")["o_totalprice"].sum().reset_index(name="rev")
    daily["month"] = daily["day"].dt.to_period("M")
    daily["dow"] = daily["day"].dt.dayofweek + 1
    daily["dev"] = daily["rev"] - daily.groupby("month")["rev"].transform("mean")
    daily["e"] = daily["dev"] - daily["dow"].map(daily.groupby("dow")["dev"].mean())
    s = daily.set_index("day")["e"].sort_index()
    prev = s.reindex(s.index - pd.Timedelta(days=1))
    pairs = pd.DataFrame({"p": prev.values, "c": s.values}).dropna()
    # align: e_prev at day-1 paired with e_cur at day
    cur, prv = [], []
    for d, v in s.items():
        q = d - pd.Timedelta(days=1)
        if q in s.index:
            cur.append(v)
            prv.append(s[q])
    import numpy as np

    cur, prv = np.array(cur), np.array(prv)
    dw = ((cur - prv) ** 2).sum() / (s**2).sum()
    r1 = np.corrcoef(prv, cur)[0, 1]
    assert out.n_days == len(s) and out.n_pairs == len(cur)
    assert abs(out.durbin_watson - dw) < 1e-4
    assert abs(out.r1_autocorr - r1) < 1e-4


def test_gini_matches_reference_and_plan(spark):
    from data_ingestion_project_spark.queries.advanced import revenue_gini

    out = revenue_gini(spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    rev = o.groupby("o_custkey")["o_totalprice"].sum().sort_values().to_numpy()
    n = len(rev)
    import numpy as np

    gini = 2 * (np.arange(1, n + 1) * rev).sum() / (n * rev.sum()) - (n + 1) / n
    assert out.n_customers == n
    assert abs(out.gini - gini) < 1e-5
    assert 0 <= out.gini < 1
    plan = executed_plan(revenue_gini(spark, SF)).split("== Initial Plan ==")[0]
    assert plan.count("Exchange SinglePartition") <= 2  # bucket prefix + 1-row agg
    assert "hashpartitioning(bkt" in plan


def test_kaplan_meier_matches_lifelines_style_reference(spark):
    """KM curve against a direct pandas implementation of the
    product-limit estimator with the documented 7-day censoring rule;
    also pins the survival curve's invariants (monotone nonincreasing,
    starts ≤ 1, risk-set accounting sums to the user count)."""
    from data_ingestion_project_spark.queries.stats import kaplan_meier_retention

    out = kaplan_meier_retention(spark, SF).toPandas()
    e = _events_pdf()
    e["day"] = pd.to_datetime(e["ts"]).dt.floor("D")
    pu = e.groupby("user_id")["day"].agg(["min", "max"])
    end = pu["max"].max()
    t = (pu["max"] - pu["min"]).dt.days
    churned = (end - pu["max"]).dt.days >= 7
    n = len(pu)
    surv, rows = 1.0, {}
    for d in sorted(t.unique()):
        at_risk = int((t >= d).sum())
        deaths = int((churned & (t == d)).sum())
        censored = int((~churned & (t == d)).sum())
        surv *= (at_risk - deaths) / at_risk if at_risk else 0.0
        rows[d] = (at_risk, deaths, censored, surv)
    assert len(out) == len(rows)
    for r in out.itertuples():
        ar, de, ce, s = rows[r.t_days]
        assert (r.at_risk, r.deaths, r.censored) == (ar, de, ce)
        assert abs(r.survival - s) < 1e-5
    # invariants
    sv = out.sort_values("t_days")["survival"].to_numpy()
    assert (sv[:-1] >= sv[1:] - 1e-12).all() and sv[0] <= 1.0
    assert int(out["deaths"].sum() + out["censored"].sum()) == n


def test_theil_sen_matches_reference_computation(spark):
    """Numpy pairwise replay at sf0.001: daily truncated cents, all
    pairwise slopes micro-truncated, interpolated medians, OLS from
    exact moments — every output of the query reproduced independently."""
    import numpy as np

    from data_ingestion_project_spark.queries.stats import theil_sen_revenue_trend

    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.trunc(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    day = (
        (o["o_orderdate"] - pd.Timestamp("1995-01-01")).dt.days.to_numpy()
    ).astype(np.int64)
    dd = pd.DataFrame({"day": day, "cents": cents}).groupby("day", as_index=False).sum()
    x = dd["day"].to_numpy(dtype=np.float64)
    y = dd["cents"].to_numpy(dtype=np.float64)
    n = len(x)
    dx = x[None, :] - x[:, None]
    dy = y[None, :] - y[:, None]
    iu = np.triu_indices(n, 1)
    slopes_q = np.trunc(dy[iu] / dx[iu] * 1e6).astype(np.int64)
    m_q = float(np.median(slopes_q))
    resid_q = np.trunc((y - (m_q / 1e6) * x) * 1e6).astype(np.int64)
    b_q = float(np.median(resid_q))
    sxy, sx, sy, sxx = (x * y).sum(), x.sum(), y.sum(), (x * x).sum()
    ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    def rnd(v, s):
        return math.copysign(math.floor(abs(v) * 10**s + 0.5) / 10**s, v)

    out = theil_sen_revenue_trend(spark, SF).toPandas().iloc[0]
    assert out.n_days == n and out.n_pairs == n * (n - 1) // 2
    assert out.sen_slope_usd_day == rnd(m_q / 1e6 / 100, 4)
    assert out.sen_intercept_usd == rnd(b_q / 1e6 / 100, 2)
    assert out.ols_slope_usd_day == rnd(ols / 100, 4)


def test_theil_sen_robust_to_planted_outlier(spark, tmp_path):
    """One flash-sale outlier day on a clean $10/day linear trend: the
    Sen slope stays on the trend while OLS is dragged off it — the
    breakdown behavior that is the estimator's reason to exist."""
    from data_ingestion_project_spark.queries.stats import theil_sen_revenue_trend

    days = list(range(100))
    rows = [
        (pd.Timestamp("1995-01-01") + pd.Timedelta(days=d), 1000.0 + 10.0 * d)
        for d in days
    ]
    rows[99] = (rows[99][0], 1_000_000.0)  # outlier on the max-leverage day
    pdf = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    # micro-precision timestamps: nano columns read as LONG under the
    # session's nanosAsLong setting and break to_date
    pdf.to_parquet(tmp_path / "orders.parquet", index=False, coerce_timestamps="us")
    out = theil_sen_revenue_trend(spark, str(tmp_path)).toPandas().iloc[0]
    assert abs(out.sen_slope_usd_day - 10.0) < 0.1
    assert abs(out.ols_slope_usd_day - 10.0) > 100.0


def test_cusum_finds_planted_changepoint(spark, tmp_path):
    """A clean level shift on day 60 of 100 (one order/day at $1,000
    before, $3,000 from day 60): argmax-CUSUM must locate day 59 as
    the last pre-shift day and recover both levels exactly."""
    from data_ingestion_project_spark.queries.stats import cusum_revenue_changepoint

    rows = [
        (
            pd.Timestamp("1995-01-01") + pd.Timedelta(days=d),
            1000.0 if d < 60 else 3000.0,
        )
        for d in range(100)
    ]
    pdf = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    pdf.to_parquet(tmp_path / "orders.parquet", index=False, coerce_timestamps="us")
    out = cusum_revenue_changepoint(spark, str(tmp_path)).toPandas().iloc[0]
    assert out.cp_date == "1995-03-01"  # day index 59, the pre-shift edge
    assert out.k_days == 60 and out.n_days == 100
    assert out.mean_before_usd == 1000.0
    assert out.mean_after_usd == 3000.0
    assert out.s_cusum_usd < 0  # pre-shift prefix sits below the global mean


def test_cusum_matches_reference_computation(spark):
    """Numpy replay at sf0.001: truncated daily cents, exact T_k =
    n·cum − k·total, argmax with earliest-day tie-break, all derived
    dollar figures."""
    import numpy as np

    from data_ingestion_project_spark.queries.stats import cusum_revenue_changepoint

    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = np.trunc(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
    dd = (
        pd.DataFrame({"d": o["o_orderdate"].dt.normalize(), "cents": cents})
        .groupby("d", as_index=False)
        .sum()
        .sort_values("d")
        .reset_index(drop=True)
    )
    cum = dd["cents"].cumsum().to_numpy()
    n = len(dd)
    total = int(cum[-1])
    k = np.arange(1, n + 1)
    t_k = n * cum - k * total
    i = int(np.lexsort((k, -np.abs(t_k)))[0])

    def rnd(v, s):
        return math.copysign(math.floor(abs(v) * 10**s + 0.5) / 10**s, v)

    out = cusum_revenue_changepoint(spark, SF).toPandas().iloc[0]
    assert out.cp_date == dd["d"].iloc[i].strftime("%Y-%m-%d")
    assert out.k_days == i + 1 and out.n_days == n
    assert out.mean_before_usd == rnd(cum[i] / (i + 1) / 100, 4)
    assert out.mean_after_usd == rnd((total - cum[i]) / (n - i - 1) / 100, 4)
    assert out.s_cusum_usd == rnd(t_k[i] / n / 100, 2)


def test_attribution_multitouch_planted_weights(spark, tmp_path):
    """One $100 purchase with four prior clicks on distinct weekdays:
    U-shaped credit must land 40/10/10/40 and linear 25 each, on the
    click days (not the purchase day); a click outside the 7-day
    window earns nothing."""
    from data_ingestion_project_spark.queries.events import (
        attribution_multitouch_dow,
    )

    t0 = pd.Timestamp("2024-03-08 12:00:00")  # a Friday
    rows = [
        # four qualifying clicks: Mon..Thu of the same week
        (1, t0 - pd.Timedelta(days=4), 7, "click", 0.0),
        (2, t0 - pd.Timedelta(days=3), 7, "click", 0.0),
        (3, t0 - pd.Timedelta(days=2), 7, "click", 0.0),
        (4, t0 - pd.Timedelta(days=1), 7, "click", 0.0),
        # a click 8 days back: outside the window
        (5, t0 - pd.Timedelta(days=8), 7, "click", 0.0),
        (6, t0, 7, "purchase", 100.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = "{}"
    pdf.to_parquet(tmp_path / "events.parquet", index=False, coerce_timestamps="us")
    out = attribution_multitouch_dow(spark, str(tmp_path)).toPandas()
    got = {int(r.click_dow): (r.n_touches, r.linear_usd, r.ushape_usd)
           for _, r in out.iterrows()}
    assert got == {
        1: (1, 25.0, 40.0),  # Monday: first touch
        2: (1, 25.0, 10.0),
        3: (1, 25.0, 10.0),
        4: (1, 25.0, 40.0),  # Thursday: last touch
    }


def test_attribution_models_conserve_purchase_value(spark):
    """Both models must attribute (almost exactly) the same total: the
    full value of every purchase with >= 1 qualifying click.  Credits
    are nano-truncated per touch, so each model may undercount a
    purchase by < n_touches nano-dollars — bound the gap accordingly."""
    import numpy as np

    from data_ingestion_project_spark.queries.events import (
        attribution_multitouch_dow,
    )

    out = attribution_multitouch_dow(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["ts"] = pd.to_datetime(e["ts"])
    clicks = e[e.event_type == "click"][["user_id", "ts"]]
    attributed = 0.0
    n_touch = 0
    for _, p in e[e.event_type == "purchase"].iterrows():
        c = clicks[
            (clicks.user_id == p.user_id)
            & (clicks.ts <= p.ts)
            & (clicks.ts > p.ts - pd.Timedelta(days=7))
        ]
        if len(c):
            attributed += math.trunc(p.value * 1e6)
            n_touch += len(c)
    attributed /= 1e6
    assert out.n_touches.sum() == n_touch
    for col in ("linear_usd", "ushape_usd"):
        total = out[col].sum()
        assert attributed - n_touch * 1e-9 - 7e-4 <= total <= attributed + 7e-4


def test_drawdown_planted_peak_trough(spark, tmp_path):
    """Planted series: rise to a $5,000 peak on day 10, crash to
    $1,000 on day 15, recover — max drawdown 0.8 with exactly those
    dates; the later smaller dip must not win."""
    from data_ingestion_project_spark.queries.stats import revenue_drawdown

    level = {10: 5000.0, 15: 1000.0, 25: 4000.0, 30: 3500.0}
    rows = [
        (
            pd.Timestamp("1995-01-01") + pd.Timedelta(days=d),
            level.get(d, 2000.0 + 10.0 * d),
        )
        for d in range(40)
    ]
    pdf = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    pdf.to_parquet(tmp_path / "orders.parquet", index=False, coerce_timestamps="us")
    out = revenue_drawdown(spark, str(tmp_path)).toPandas().iloc[0]
    assert out.peak_date == "1995-01-11" and out.trough_date == "1995-01-16"
    assert out.peak_usd == 5000.0 and out.trough_usd == 1000.0
    assert out.max_drawdown == 0.8
    assert out.n_days == 40 and out.ann_volatility > 0


def test_stylometry_delta_planted_styles(spark, tmp_path):
    """Two sources with the same word-frequency profile must score the
    smallest Delta; a third source writing from a different profile
    must sit farther from both."""
    from data_ingestion_project_spark.queries.documents import (
        source_stylometry_delta,
    )

    twin = ("alpha beta gamma delta " * 10).strip()
    odd = ("zeta zeta zeta eta theta " * 10).strip()
    rows = []
    for i in range(10):
        rows.append((i, twin, "en", "s_twin1", len(twin)))
        rows.append((100 + i, twin + " beta", "en", "s_twin2", len(twin)))
        rows.append((200 + i, odd, "en", "s_odd", len(odd)))
    pdf = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    out = source_stylometry_delta(spark, str(tmp_path)).toPandas()
    assert out.iloc[0].source_a == "s_twin1" and out.iloc[0].source_b == "s_twin2"
    top = out.iloc[0].delta
    others = out[(out.source_a != "s_twin1") | (out.source_b != "s_twin2")]
    assert (others.delta > top + 0.5).all()


def test_rfm_planted_segments(spark, tmp_path):
    """25 customers engineered so every quintile holds exactly 5: the
    top-5 on all three dimensions must classify as champions, and the
    5 oldest-and-rarest buyers as hibernating."""
    from data_ingestion_project_spark.queries.advanced import rfm_segments

    rows = []
    base = pd.Timestamp("1995-01-01")
    for c in range(25):
        # customer c: c+1 orders, last one (24-c) days before the
        # anchor, each worth (c+1)*100 — all three dimensions aligned
        for k in range(c + 1):
            rows.append((c, base + pd.Timedelta(days=c), (c + 1) * 100.0))
    pdf = pd.DataFrame(rows, columns=["o_custkey", "o_orderdate", "o_totalprice"])
    pdf.to_parquet(tmp_path / "orders.parquet", index=False, coerce_timestamps="us")
    out = rfm_segments(spark, str(tmp_path)).toPandas().set_index("segment")
    # aligned dimensions: the top TWO quintiles (scores 4 and 5) all
    # clear the champions rule; the bottom two land in hibernating
    assert out.loc["champions"].n_customers == 10
    assert out.loc["champions"].avg_r == 4.5
    assert out.loc["champions"].avg_f == 4.5
    assert out.loc["champions"].avg_m == 4.5
    assert out.loc["hibernating"].n_customers == 10
    assert out.loc["hibernating"].avg_r == 1.5
    assert out.loc["others"].n_customers == 5  # the middle quintile
    # champions carry the dominant revenue share
    assert out.loc["champions"].revenue_share > 0.5


def test_wilson_ci_reference_and_coverage_properties(spark):
    """Wilson bounds against scipy-free closed-form reference per dow:
    lo < p_hat < hi (when 0<k<n), interval within [0,1], and exact
    n/k reproduction from a pandas replay of the 24 h conversion rule."""
    import numpy as np

    from data_ingestion_project_spark.queries.events import conversion_wilson_ci

    out = conversion_wilson_ci(spark, SF).toPandas()
    e = pd.read_parquet(f"{SF}/events.parquet")
    e["ts"] = pd.to_datetime(e["ts"])
    clicks = e[e.event_type == "click"]
    purch = e[e.event_type == "purchase"][["user_id", "ts"]]
    by_dow_n = {}
    by_dow_k = {}
    for _, c in clicks.iterrows():
        dow = c.ts.isoweekday()
        by_dow_n[dow] = by_dow_n.get(dow, 0) + 1
        p = purch[
            (purch.user_id == c.user_id)
            & (purch.ts >= c.ts)
            & (purch.ts <= c.ts + pd.Timedelta(hours=24))
        ]
        if len(p):
            by_dow_k[dow] = by_dow_k.get(dow, 0) + 1
    for _, r in out.iterrows():
        assert r.n == by_dow_n[r.dow] and r.k == by_dow_k.get(r.dow, 0)
        z = 1.96
        p = r.k / r.n
        center = (p + z * z / (2 * r.n)) / (1 + z * z / r.n)
        half = (
            z
            * math.sqrt(p * (1 - p) / r.n + z * z / (4 * r.n * r.n))
            / (1 + z * z / r.n)
        )
        assert abs(r.wilson_lo - (center - half)) < 2e-6
        assert abs(r.wilson_hi - (center + half)) < 2e-6
        assert 0.0 <= r.wilson_lo < r.p_hat < r.wilson_hi <= 1.0


def test_forecast_backtest_planted_weekly_pattern(spark, tmp_path):
    """A pure weekly pattern over 10 weeks: seasonal-naive forecasts
    the 28-day holdout perfectly (MAE = RMSE = MAPE = 0) while the
    drift baseline cannot."""
    from data_ingestion_project_spark.queries.stats import forecast_backtest

    weekly = [1000.0, 2000.0, 1500.0, 3000.0, 2500.0, 4000.0, 500.0]
    rows = [
        (pd.Timestamp("1995-01-02") + pd.Timedelta(days=d), weekly[d % 7])
        for d in range(70)
    ]
    pdf = pd.DataFrame(rows, columns=["o_orderdate", "o_totalprice"])
    pdf.to_parquet(tmp_path / "orders.parquet", index=False, coerce_timestamps="us")
    out = forecast_backtest(spark, str(tmp_path)).toPandas().set_index("method")
    sn = out.loc["seasonal_naive"]
    assert sn.n_days == 28
    assert sn.mae_usd == 0.0 and sn.rmse_usd == 0.0 and sn.mape == 0.0
    dr = out.loc["drift"]
    assert dr.n_days == 28 and dr.mae_usd > 100.0
