"""Mergeable quantile sketch via deterministic bottom-k hash sampling —
the quantile member of the standing-sketch family next to the HLL /
theta distinct sketches and the Misra-Gries frequent-items summaries
(queries/advanced.py, operators/heavy_hitters.py).

Why not approx_percentile? Spark's builtin estimate is TERMINAL — you
cannot store per-day results and combine them into a month's quantile
without rescanning the facts. The standing-aggregate design at 100 TB
computes one bounded sketch per partition/day at ingest; any date-range
quantile query then merges the stored ~K-row sketches, zero fact
rescan.

The sketch is the classic bottom-k (order) sample: the K rows whose
``xxhash64(key)`` is smallest form a uniform sample of the group —
DETERMINISTIC (a pure function of the data: no RNG, no partitioning
dependence, rerun-stable) and MERGEABLE by construction (the bottom-k
of a union is the bottom-k of the concatenated bottom-k's — an exact
algebraic identity, not an approximation, so merge-of-parts equals
direct-whole BIT-FOR-BIT, which the pytest pins). Quantile estimates
read the sample at rank ceil(p·n); sampling error is the usual
O(1/sqrt(K)) in rank — certified by a rank-error floor in pytest, the
same posture as the HLL/theta 5% floors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SKETCH_TYPE = "array<struct<h:bigint,v:double>>"
SKETCH_TYPE_MD5 = "array<struct<h:string,v:double>>"


def bottomk_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    key_col: str,
    k: int = 1024,
    use_md5: bool = False,
) -> DataFrame:
    """One sketch row per group: ``sketch`` = array<struct<h,v>> of the
    K smallest-hash (hash, value) pairs, sorted by (h, v).

    ``key_col`` must identify rows (e.g. the event id): the hash of a
    row key — not of the value — is what makes the sample uniform over
    ROWS and the sketch insertion-order/partitioning independent.
    NULL values are excluded (SQL aggregate convention).

    ``use_md5`` switches the sample order from seeded ``xxhash64``
    (JVM codegen speed — the production default) to
    ``md5(key::string)`` hex ordering: md5 over identical strings is
    identical in Spark AND DuckDB, and any uniform total order gives a
    valid bottom-k sample, so the ENTIRE sketch pipeline becomes
    replayable as ANSI SQL — the same engine-portability trade as
    operators/dedup.md5_minhash_candidates, and what lets the rollup
    query be certified value-exactly against a DuckDB oracle.

    Scale shape (r10, found by the sf100 decade — 8.1 s → 251.6 s,
    alpha 1.49): the original plan ranked EVERY row of a group through
    the per-group sort window just to keep k, so each day's full
    multi-million-row slice was shuffled and sorted (with 32-char md5
    strings) and day-count capped the parallelism. The build now
    PRE-PRUNES with a per-group hash threshold before anything heavy:
    one map-side-combined count pass sizes each group, rows keep only
    hashes below ~(8k/n_g) of the hash space (a superset of the true
    bottom-k with probability 1 − e^{-Θ(k)}), and an EXACT FALLBACK
    re-admits any group whose pruned+deduped row count came up short
    (kc < min(k, n_g)) — so the result is the true bottom-k on ANY
    input, deterministically, while the sort window touches ~8k rows
    per group instead of n_g. Remeasured sf10→sf100: alpha 1.49 →
    see SCALING.json (the count pass is the only full-stream stage
    left)."""
    from pyspark.sql.window import Window

    prune_mult = 8  # expected kept rows per group = prune_mult * k

    h = (
        F.md5(F.col(key_col).cast("string"))
        if use_md5
        else F.xxhash64(F.col(key_col))
    )
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        F.col(value_col).cast("double").alias("__v"),
        h.alias("__h"),
    )
    # order-preserving integer prefix of the hash for thresholding:
    # md5 hex -> first 15 hex chars as a 60-bit int (prefix order is a
    # coarsening of full-string order, so "prefix <= t" keeps a
    # superset); xxhash64 is already a long (signed order)
    if use_md5:
        pfx = F.conv(F.substring(F.col("__h"), 1, 15), 16, 10).cast("long")
        space, origin = float(1 << 60), 0.0
    else:
        pfx = F.col("__h")
        space, origin = float(1 << 64), -float(1 << 63)
    counts = base.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("__n"))
    frac = F.lit(float(prune_mult * k)) / F.col("__n").cast("double")
    # origin shifts the signed-long hash domain; the sum stays inside
    # [-2^63, 2^63) in DOUBLE before the single long cast
    thresh = F.when(F.col("__n") <= F.lit(prune_mult * k), F.lit(None)).otherwise(
        F.floor(frac * F.lit(space) + F.lit(origin)).cast("long")
    )
    filtered = (
        base.join(F.broadcast(counts), list(group_cols))
        .withColumn("__t", thresh)
        .filter(F.col("__t").isNull() | (pfx <= F.col("__t")))
    )
    # the sketch is a SET of (hash, value) pairs: identical pairs
    # collapse, which is what makes the fold IDEMPOTENT — merging a
    # replayed/re-executed batch cannot grow the sketch. A genuine
    # data duplicate has a different row key, hence a different hash;
    # only the same row replayed (or a measure-zero h+v collision)
    # collapses. Dedup runs on the PRUNED frame (~prune_mult*k rows
    # per group), not the stream.
    # r12: the pruned path folds dedup + per-group bottom-k + collect
    # into ONE aggregation — slice(array_sort(collect_set), 1, k): the
    # set dedups (the idempotence contract above), array_sort orders by
    # (h, v), slice keeps the bottom k — bit-identical to the previous
    # dedup-exchange → kept-count agg → anti-join → rank-window →
    # collect pipeline (5 stages → 1).  Per-group aggregation state is
    # the pruned row set (~prune_mult·k w.p. 1 − e^{-Θ(k)}); the EXACT
    # FALLBACK below keeps the spillable window form for any group the
    # prune left short, so correctness never rests on that bound.
    sets = filtered.groupBy(*group_cols).agg(
        F.array_sort(
            F.collect_set(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
        ).alias("__all")
    )
    sized = counts.join(sets, list(group_cols), "left")
    ok = sized.filter(
        F.coalesce(F.size("__all"), F.lit(0))
        >= F.least(F.lit(k).cast("long"), F.col("__n"))
    ).select(
        *group_cols,
        F.slice("__all", 1, k)
        # normalize nullability so sketches from any producer
        # (fresh build, merge of stored sketches) share ONE schema
        .cast(SKETCH_TYPE_MD5 if use_md5 else SKETCH_TYPE)
        .alias("sketch"),
    )
    short = sized.filter(
        F.coalesce(F.size("__all"), F.lit(0))
        < F.least(F.lit(k).cast("long"), F.col("__n"))
    ).select(*group_cols)
    fb_rows = (
        base.join(F.broadcast(short), list(group_cols), "left_semi")
        .dropDuplicates([*group_cols, "__h", "__v"])
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("__h").asc(), F.col("__v").asc()
    )
    fb = (
        fb_rows.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*group_cols)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("__h").alias("h"), F.col("__v").alias("v")))
            )
            .cast(SKETCH_TYPE_MD5 if use_md5 else SKETCH_TYPE)
            .alias("sketch")
        )
    )
    return ok.unionByName(fb)


def merge_bottomk(
    sketches: DataFrame,
    group_cols: list[str] | None = None,
    k: int = 1024,
    fold_salts: int | None = 32,
) -> DataFrame:
    """Merge stored sketches into one per ``group_cols`` bucket (empty
    list = one global sketch): explode, keep the K smallest (h, v)
    pairs, re-collect. Exactly the bottom-k of the union — so rolling
    day sketches up to a month equals sketching the month directly.

    r12 folded the merge into ONE ``slice(array_sort(collect_set))``
    aggregation (collect_set keeps the SAME set semantics — a pair
    present in two input sketches counts once; array_sort the same
    (h, v) order; slice the same bottom k) — but that one fold holds
    k × (sketches per group) structs in a single non-spillable
    aggregation buffer, an OOM risk when thousands of shards roll up
    to ONE global sketch (the r12 VERDICT's flagged regression).

    r13: TWO-LEVEL merge (``fold_salts``, default 32).  Level 1 folds
    per (group, salt) with salt = pmod(xxhash64(h), fold_salts) — a
    pure function of the pair, so identical pairs land in one salt
    bucket and dedup completely — and slices each bucket to its own
    bottom-k; level 2 folds the ≤ fold_salts partial sketches.  The
    global bottom-k of a union equals the bottom-k of the concatenated
    per-bucket bottom-k's for ANY partition of the pairs (each
    bucket's contribution to the answer is at most its own k
    smallest), so the result is bit-identical to the single fold.
    Memory contract next to the k bound: level-2 state is ≤
    fold_salts·k structs (hard-bounded); level-1 state is the
    bucket's distinct pairs ≈ (inputs·k)/fold_salts per task —
    fold_salts scales it down and spreads one giant group over
    fold_salts tasks.  ``fold_salts=None`` keeps the single r12 fold
    for callers that CONTRACT bounded inputs per group (the streaming
    per-day upsert merges ≤ 2 sketches/group)."""

    group_cols = group_cols or []
    exploded = sketches.select(*group_cols, F.explode("sketch").alias("e")).select(
        *group_cols, F.col("e.h").alias("__h"), F.col("e.v").alias("__v")
    )
    # re-cast to the INPUT's own sketch element type (bigint- or
    # md5-string-keyed), normalizing collect_set nullability
    tpe = sketches.schema["sketch"].dataType.simpleString()
    pair = F.struct(F.col("__h").alias("h"), F.col("__v").alias("v"))
    if fold_salts is not None and fold_salts > 1:
        lvl1 = exploded.groupBy(
            *group_cols,
            F.pmod(F.xxhash64(F.col("__h")), F.lit(fold_salts)).alias("__salt"),
        ).agg(F.slice(F.array_sort(F.collect_set(pair)), 1, k).alias("__part"))
        exploded = lvl1.select(
            *group_cols, F.explode("__part").alias("e")
        ).select(*group_cols, F.col("e.h").alias("__h"), F.col("e.v").alias("__v"))
    return exploded.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.collect_set(pair)), 1, k)
        .cast(tpe)
        .alias("sketch")
    )


def sketch_quantile(sketch: Column, p: float) -> Column:
    """Estimate the p-quantile from a sketch column: the sample value
    at rank ceil(p·n) (1-indexed, clamped to [1, n])."""
    vs = F.array_sort(F.transform(sketch, lambda s: s.getField("v")))
    n = F.size(vs)
    idx = F.greatest(F.lit(1), F.least(n, F.ceil(F.lit(float(p)) * n).cast("int")))
    return F.element_at(vs, idx)
