"""Bloom filter as a maintained membership asset — the set-membership
member of the standing-sketch family (CMS = point frequency, KMV/HLL =
distinct count, bottom-k = quantiles, Misra-Gries = heavy hitters):
"might this key be in the accepted set?" with zero false negatives and
a tunable false-positive rate, in m bits instead of the key set.

Representation: the SET-BIT table (bit,) — one row per set bit,
≤ m rows regardless of member count. That row form makes the filter
- **mergeable by plain union+distinct** — SET semantics, so merge is
  IDEMPOTENT (unlike the additive CMS: a replayed maintenance batch
  cannot corrupt it, no fence needed — the quantile-sketch argument);
- **broadcastable** — m defaults to 4096 rows max, so membership
  probes are a broadcast join against the probe side, map-only at any
  probe cardinality;
- **engine-portable** — bits come from the repo's md5-prefix integer
  idiom, salted per hash function, so build AND probe replay as ANSI
  SQL and the census query carries a value-exact oracle.

At 100 TB the filter fronts expensive lookups: "was this doc_id ever
accepted", "does this partkey appear in the hot window" — a negative
answer (the common case) costs a broadcast probe instead of a
fact-table semi-join; positives fall through to the exact path. The
classic FP bound (1 − e^{−kn/m})^k is pinned in pytest, as is the
zero-false-negative guarantee.

Reference parity: n/a (SURVEY.md header); north-star component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 4096
K_HASHES = 3


def _bit(item: Column, h: Column | int, m: int) -> Column:
    """Hash-h's bit for an item: 48-bit md5 prefix of ``h:item`` mod m
    (the salted portable-hash idiom shared with CMS/KMV)."""
    hc = F.lit(h) if isinstance(h, int) else h
    key = F.concat(hc.cast("string"), F.lit(":"), item.cast("string"))
    return F.conv(F.substring(F.md5(key), 1, 12), 16, 10).cast("long") % m


def bloom_bits(
    members: DataFrame, item_col: str, m: int = M_BITS, k: int = K_HASHES
) -> DataFrame:
    """The filter itself: distinct set bits over all members × k hash
    functions. ≤ m rows; merge two filters with
    ``a.union(b).distinct()`` (idempotent SET fold)."""
    h = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("h")
    return (
        members.select(F.col(item_col).alias("__item"))
        .select("__item", h)
        .select(_bit(F.col("__item"), F.col("h"), m).alias("bit"))
        .distinct()
    )


def bloom_probe(
    probes: DataFrame,
    bits: DataFrame,
    item_col: str,
    m: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """Append ``maybe_member`` to ``probes``: true iff ALL k of the
    item's bits are set. The filter side is ≤ m rows — always
    broadcast — so the probe is map-side at any probe cardinality."""
    h = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("h")
    pb = probes.select(F.col(item_col)).distinct().select(
        item_col, h
    ).select(item_col, _bit(F.col(item_col), F.col("h"), m).alias("bit"))
    hits = (
        pb.join(F.broadcast(bits), "bit", "left_semi")
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("__nbits"))
        .filter(F.col("__nbits") == k)
        .select(item_col, F.lit(True).alias("maybe_member"))
    )
    return probes.join(hits, item_col, "left").fillna(
        False, subset=["maybe_member"]
    )
