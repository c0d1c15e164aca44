"""Skew-mitigation proof (VERDICT r7 ask #5): the engine doesn't just
DETECT hot join keys (join_key_skew_audit) — it survives them, and the
surviving plans are pinned here.

Two mitigation paths, both pinned:

1. **AQE skew-join split** — the zero-code path: a sort-merge join
   whose hot partition exceeds the skew threshold is split at runtime
   into chunks, each joined against the (replicated) matching side.
   The executed plan marks the join ``skew=true``; we assert the
   marker appears exactly when mitigation is on, with row-identical
   results. (Thresholds are lowered to make a test-sized hot key
   qualify; production keeps the 256 MB default — the mechanism, not
   the constant, is what's pinned.  Measured wall-clock before/after
   at the sf1 decade is recorded in BASELINE.md via
   tools/skew_demo.py.)

2. **Salted join** (operators/scale.salted_join) — the explicit path
   for engines/joins AQE can't split: the hot side salts, the other
   side replicates, and the result is row-identical to the plain join
   while the hot key's work spreads over n_salts reducers (pinned by
   asserting the shuffle key includes the salt column).
"""

from __future__ import annotations

from pyspark.sql import functions as F

HOT_SHARE_ROWS = 60_000  # rows on the single hot key
TAIL_KEYS = 1_000


def _skewed_left(spark):
    """~120k-row fact side: key 0 owns half the rows (a pathological
    hot key), the rest spread uniformly over 1000 keys; an
    INCOMPRESSIBLE ~192-byte payload (per-row hashes) so the
    compressed shuffle-partition bytes AQE inspects actually reflect
    the hot key (a constant payload lz4-compresses to nothing and
    hides the skew from the byte thresholds)."""
    return (
        spark.range(2 * HOT_SHARE_ROWS)
        .select(
            F.when(F.col("id") < HOT_SHARE_ROWS, F.lit(0))
            .otherwise((F.col("id") % TAIL_KEYS) + 1)
            .alias("k"),
            F.col("id").alias("row_id"),
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.sha2((F.col("id") + 1).cast("string"), 256),
                F.sha2((F.col("id") + 2).cast("string"), 256),
            ).alias("payload"),
        )
    )


def _dim_right(spark):
    return spark.range(TAIL_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("dim_val")
    )


def _with_conf(spark, conf: dict):
    saved = {k: spark.conf.get(k, None) for k in conf}
    for k, v in conf.items():
        spark.conf.set(k, v)
    return saved


def _restore_conf(spark, saved: dict):
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_planted_hot_key_and_result_is_identical(spark):
    from data_ingestion_project_spark.plans.explain import executed_plan

    conf = {
        # force SMJ (the dim side would broadcast and hide the skew)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # scale the skew thresholds down to test size: hot partition
        # ~6 MB vs sub-100 KB median — same >5x-median, >threshold
        # geometry a 256 MB-default production hot key presents
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = _with_conf(spark, conf)
    try:
        left, right = _skewed_left(spark), _dim_right(spark)

        joined = left.join(right, "k")
        agg = joined.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("dim_val").alias("s")
        )
        # mitigated: the executed SMJ must carry the skew=true marker
        plan_on = executed_plan(joined)
        assert "skew=true" in plan_on, plan_on[:2000]

        # unmitigated twin: same join with the splitter off
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        plan_off = executed_plan(left.join(right, "k"))
        assert "skew=true" not in plan_off
        agg_off = (
            left.join(right, "k")
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("dim_val").alias("s"))
        )
        off_rows = {r["k"]: (r["n"], r["s"]) for r in agg_off.collect()}
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

        on_rows = {r["k"]: (r["n"], r["s"]) for r in agg.collect()}
        # mitigation must not change a single row
        assert on_rows == off_rows
        assert on_rows[0] == (HOT_SHARE_ROWS, 0)
    finally:
        _restore_conf(spark, saved)


def test_salted_join_spreads_hot_key_and_matches_plain_join(spark):
    from data_ingestion_project_spark.operators.scale import salted_join
    from data_ingestion_project_spark.plans.explain import formatted_plan

    left, right = _skewed_left(spark), _dim_right(spark)
    plain = left.join(right, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    salted = (
        salted_join(left, right, "k", n_salts=8)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # row-identical to the plain join
    assert {(r["k"], r["n"]) for r in salted.collect()} == {
        (r["k"], r["n"]) for r in plain.collect()
    }
    # and the join key genuinely includes the salt: the hot key's rows
    # now hash to 8 distinct reducer keys instead of 1
    plan = formatted_plan(salted_join(left, right, "k", n_salts=8))
    assert "__salt" in plan
