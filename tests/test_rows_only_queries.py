"""Query-grain tests for the rows-only queries the driver can't
value-certify (VERDICT r7 ask #2): each approximate/iterative query is
pinned against either a pure-Python/numpy replay of its exact contract
or an error floor vs its oracle-certified exact twin — so `rows-only`
never means `untested`.

VERDICT r7 ask #8 lives here too: Datasketches-backed sketch queries
have deterministic point estimates on a fixed corpus, so their sf0.001
outputs are pinned value-exactly — a silent sketch-config change (lgK,
seed, estimator) cannot drift unnoticed.  (Since r10/r11 the declared
sketch queries — sketch_rollup_dau, theta_weekly_retention — are
portable-deterministic and FULLY oracle-certified; the binary
Datasketches twins pinned here are the pytest-only production
variants.)
"""

from __future__ import annotations

import re

import duckdb
import numpy as np

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"

END = "</w>"


def _ref_bpe_train(words: dict, n_merges: int, min_pair_count: int = 2):
    """Sennrich alg. 1 reference (same as tests/test_operators.py),
    count-desc + lexicographic tie-break."""
    vocab = {tuple(list(w) + [END]): f for w, f in words.items()}
    out = []
    for _ in range(n_merges):
        pairs: dict = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] = pairs.get((syms[i], syms[i + 1]), 0) + f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (l, r), cnt = best
        out.append((l, r, cnt))
        nv: dict = {}
        for syms, f in vocab.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            nv[tuple(merged)] = nv.get(tuple(merged), 0) + f
        vocab = nv
    return out


def _corpus_word_freqs(sf_dir: str) -> dict:
    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
        if t is not None
    ]
    freqs: dict = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    return freqs


def test_bpe_learned_merges_matches_reference_on_real_corpus(spark):
    """The query-grain twin of the operator test: the distributed
    trainer over the ACTUAL sf0.001 documents table must produce the
    same ranked merge table as the pure-Python reference over the same
    word-frequency dict."""
    from data_ingestion_project_spark.queries import all_queries

    got = [
        (r["rank"], r["left"], r["right"], r["pair_count"])
        for r in all_queries()["bpe_learned_merges"](spark, SF0001)
        .orderBy("rank")
        .collect()
    ]
    ref = _ref_bpe_train(_corpus_word_freqs(SF0001), n_merges=10)
    assert got == [(i + 1, l, r, n) for i, (l, r, n) in enumerate(ref)]
    assert len(got) == 10  # the corpus is rich enough to learn all 10


def test_bpe_real_token_stats_matches_reference_replay(spark):
    """Per-language stats under the corpus-trained tokenizer must equal
    a pure-Python replay: train (reference), greedily encode every word
    by merge rank, aggregate per lang."""
    from data_ingestion_project_spark.queries import all_queries

    merges = _ref_bpe_train(_corpus_word_freqs(SF0001), n_merges=10)
    ranks = {(l, r): i for i, (l, r, _n) in enumerate(merges)}

    def encode_len(word: str) -> int:
        syms = list(word) + [END]
        while len(syms) > 1:
            best_i, best_rank = -1, None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_i, best_rank = i, rk
            if best_rank is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return len(syms)

    rows = duckdb.sql(
        f"SELECT lang, text, n_chars FROM '{SF0001}/documents.parquet'"
    ).fetchall()
    agg: dict = {}
    for lang, text, n_chars in rows:
        toks = sum(
            encode_len(w)
            for w in re.split(r"\s+", (text or "").strip().lower())
            if w
        )
        n, tt, ch = agg.get(lang, (0, 0, 0))
        agg[lang] = (n + 1, tt + toks, ch + n_chars)

    got = {
        r["lang"]: r
        for r in all_queries()["bpe_real_token_stats"](spark, SF0001).collect()
    }
    assert set(got) == set(agg)
    for lang, (n, tt, ch) in agg.items():
        r = got[lang]
        assert r["n_docs"] == n
        assert r["total_tokens"] == tt
        # Spark rounds HALF_UP on doubles; accept either side of a
        # half boundary by comparing to the unrounded reference
        assert abs(r["avg_tokens"] - tt / n) <= 5.1e-5
        assert abs(r["chars_per_token"] - ch / tt) <= 5.1e-5


def test_pca_variance_audit_matches_numpy_replay_of_certified_cells(spark):
    """pca_variance_audit (rows-only: eigh is not SQL) must equal a
    numpy replay built ONLY from the oracle-certified
    embedding_covariance_stats cells — the certified integer moments
    plus deterministic driver linear algebra fully determine the
    output."""
    from data_ingestion_project_spark.queries import all_queries

    qs = all_queries()
    cells = qs["embedding_covariance_stats"](spark, SF0001).collect()
    n = duckdb.sql(
        f"SELECT COUNT(*) FROM '{SF0001}/embeddings.parquet'"
    ).fetchone()[0]
    Q = 10_000
    cov = np.zeros((64, 64))
    for r in cells:
        c = r["cov_scaled"] / (n * n * Q**2)
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = c
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:8]
    comps = v[:, order].T
    for i in range(8):
        m = int(np.argmax(np.abs(comps[i])))
        if comps[i, m] < 0:
            comps[i] = -comps[i]
    total = float(np.trace(cov))
    got = qs["pca_variance_audit"](spark, SF0001).orderBy("component").collect()
    assert len(got) == 8
    for i, r in enumerate(got):
        assert r["component"] == i
        assert abs(r["explained_ratio"] - w[order[i]] / total) <= 5.1e-5
        assert r["lead_dim"] == int(np.argmax(np.abs(comps[i])))
    ratios = [r["explained_ratio"] for r in got]
    assert ratios == sorted(ratios, reverse=True)


def test_approx_daily_active_users_error_floor_vs_exact_twin(spark):
    """HLL++ DAU (rsd=2%) vs the oracle-certified exact twin
    daily_active_users: identical day set, every day within the 5%
    relative-error floor (the sketch_rollup_dau posture)."""
    from data_ingestion_project_spark.queries import all_queries

    qs = all_queries()
    exact = {r["day"]: r["dau"] for r in qs["daily_active_users"](spark, SF001).collect()}
    approx = {
        r["day"]: r["approx_dau"]
        for r in qs["approx_daily_active_users"](spark, SF001).collect()
    }
    assert set(exact) == set(approx)
    for day, dau in exact.items():
        assert abs(approx[day] - dau) <= max(1, 0.05 * dau), (day, approx[day], dau)


def test_approx_order_price_quantiles_error_floor_vs_exact_twin(spark):
    """approx_percentile (accuracy 10000) vs the exact
    order_price_quantiles twin: per status, ap50/ap99 within 1% of the
    exact interpolated p50/p99 (the approx form returns an actual data
    value, so a sub-percent gap to the continuous quantile is the
    expected discretization, not error)."""
    from data_ingestion_project_spark.queries import all_queries

    qs = all_queries()
    exact = {
        r["o_orderstatus"]: r for r in qs["order_price_quantiles"](spark, SF001).collect()
    }
    approx = {
        r["o_orderstatus"]: r
        for r in qs["approx_order_price_quantiles"](spark, SF001).collect()
    }
    assert set(exact) == set(approx)
    for st, ex in exact.items():
        ap = approx[st]
        assert abs(ap["ap50"] - ex["p50"]) <= 0.01 * ex["p50"], (st, ap["ap50"], ex["p50"])
        assert abs(ap["ap99"] - ex["p99"]) <= 0.01 * ex["p99"], (st, ap["ap99"], ex["p99"])


def test_datasketches_dau_rollup_pinned_point_estimates(spark):
    """VERDICT r7 ask #8: Datasketches HLL estimates are deterministic
    for a fixed corpus + config. Pin the sf0.001 per-day estimates to
    the exact per-day DAU (at these tiny cardinalities the sketch is in
    exact sparse mode) and the TOTAL union row to the exact overall
    distinct count — any lgK/seed/estimator change breaks this.
    (Covers the binary-sketch twin of the oracle-certified portable
    register query sketch_rollup_dau — r10 moved the query name onto
    the replayable register implementation.)"""
    from data_ingestion_project_spark.queries.advanced import _datasketches_dau_rollup

    got = {
        r["day"]: r["est_users"]
        for r in _datasketches_dau_rollup(spark, SF0001).collect()
    }
    exact = dict(
        duckdb.sql(
            f"""SELECT strftime(ts, '%Y-%m-%d'), COUNT(DISTINCT user_id)
                FROM '{SF0001}/events.parquet' GROUP BY 1"""
        ).fetchall()
    )
    total = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM '{SF0001}/events.parquet'"
    ).fetchone()[0]
    assert set(got) == set(exact) | {"TOTAL"}
    for day, dau in exact.items():
        assert got[day] == dau, (day, got[day], dau)
    assert got["TOTAL"] == total


def test_theta_weekly_retention_pinned_point_estimates(spark):
    """VERDICT r7 ask #8, theta half (r11: the declared query is now the
    portable oracle-certified set-algebra form; this test pins the
    BINARY Datasketches twin value-exactly at sf0.001 — tiny
    cardinalities → theta sketches in exact mode, so est == exact on
    all three set-op cells; a config change that pushes them into
    estimation mode, or a seed / estimator change, breaks the pin)."""
    from data_ingestion_project_spark.queries.advanced import (
        theta_weekly_retention_datasketches,
    )

    rows = theta_weekly_retention_datasketches(spark, SF0001).collect()
    assert rows, "query returned no weeks"
    exact = {
        str(w): (nr, nc, nn)
        for w, nr, nc, nn in duckdb.sql(
            f"""
            WITH wk AS (
              SELECT CAST(date_trunc('week', ts) AS DATE) AS week, user_id
              FROM '{SF0001}/events.parquet' GROUP BY 1, 2
            ), weeks AS (SELECT DISTINCT week FROM wk),
            pairs AS (
              SELECT a.week AS wa FROM weeks a
              JOIN weeks b ON b.week = a.week + INTERVAL 7 DAY
            )
            , cells AS (
              SELECT COALESCE(a.week, b.week) AS week,
                     a.user_id IS NOT NULL AS in_a,
                     b.user_id IS NOT NULL AS in_b
              FROM wk a
              FULL OUTER JOIN (SELECT week - INTERVAL 7 DAY AS week, user_id
                               FROM wk) b
                ON b.week = a.week AND b.user_id = a.user_id
            )
            SELECT p.wa AS week,
                   SUM(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS n_ret,
                   SUM(CASE WHEN in_a AND NOT in_b THEN 1 ELSE 0 END) AS n_churn,
                   SUM(CASE WHEN NOT in_a AND in_b THEN 1 ELSE 0 END) AS n_new
            FROM pairs p JOIN cells c ON c.week = p.wa
            GROUP BY 1 ORDER BY 1
            """
        ).fetchall()
    }
    got = {
        r["week_start"]: (
            round(r["est_retained_next_week"]),
            round(r["est_churned_next_week"]),
            round(r["est_new_next_week"]),
        )
        for r in rows
    }
    assert set(got) == set(exact)
    for week, cells in exact.items():
        assert got[week] == cells, (week, got[week], cells)
