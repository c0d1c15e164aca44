"""Derive a 10× (sf1-equivalent) corpus from sf0.1 by deterministic
replication + re-keying (VERDICT r6 ask #1) — written under a
repo-owned scratch dir, never touching /root/testdata.

Replication protocol (replica r ∈ 0..9; r=0 is the original, bit-for
bit in every value column):

- **Keys re-key by r·stride** (stride = max_key+1 per table, keeping
  density), and foreign keys re-key with the SAME stride, so each
  replica is a disjoint, structurally identical copy: joins, group
  cardinalities, and match/dup pair counts scale exactly ×10 — never
  ×100 — which is the property that makes the measured decade a fair
  extrapolation of the committed plan shapes.
- **Entity-bearing names regenerate from the new key**
  (Supplier#%09d / Customer#%09d), so ER blocking keys stay ≤
  block-cap sized instead of collapsing all 10 replicas into one
  hot block.
- **Document tokens remap per replica** (token → token_xr for r>0):
  replicas share ZERO vocabulary, so minhash/simhash/winnowing/
  substring families see ×10 documents with ×10 pairs — replicating
  text verbatim would instead make every doc a 10-way exact dup and
  grow candidate pairs ×45 (10 choose 2), measuring the data
  degeneracy, not the engine.
- **Embeddings rotate by r elements** — norms and pairwise structure
  within a replica preserved, replicas decorrelated (verbatim copies
  would plant 10 coincident points at every location and degenerate
  kNN).
- **Dimension tables (nation, region) stay as-is** — dimensions do
  not grow with fact volume; that is what keeps their joins
  broadcast-able at any scale.

Usage: python tools/make_scaled_corpus.py [out_dir] [factor]
Defaults: scratch/sf1 under the repo root, factor 10.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# Graded near-dup planting (r12, VERDICT r11 ask #4): the source
# corpus's 31-word vocabulary makes EVERY random doc pair a ~0.67
# Jaccard "near-dup" — certification on it measures the degeneracy,
# not the detector.  --neardup replaces the per-replica token remap
# with a PER-DOC salt (token → token + 'q' + doc_id: baseline
# cross-doc Jaccard exactly 0, token multiplicities and doc lengths
# preserved) and then plants graded pairs: every doc with
# doc_id % 10 == 1 becomes a variant of doc_id − 1, keeping a
# (1 − f) prefix of the partner's salted tokens and re-salting the
# rest to itself, f cycling through _ND_BANDS — planted word-set
# Jaccard lands in measurable graded bands (~0.5–0.95) against a
# zero noise floor.  Row counts, ids, and every other column are
# untouched, so the corpus stays shape-compatible with the scaling
# record protocol.
_ND_BANDS = (0.05, 0.1, 0.2, 0.3, 0.4, 0.5)


def _neardup_documents_post(F):
    def post(d):
        salted = d.withColumn(
            "text",
            F.regexp_replace(
                "text", r"(\S+)", F.concat(F.lit("$1q"), F.col("doc_id").cast("string"))
            ),
        )
        partner = salted.select(
            (F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("__ptext")
        )
        j = salted.join(partner, "doc_id", "left")
        toks = F.split(F.col("__ptext"), r"\s+")
        n = F.size(toks)
        band = F.element_at(
            F.array(*[F.lit(b) for b in _ND_BANDS]),
            (F.pmod(F.floor(F.col("doc_id") / 10), F.lit(len(_ND_BANDS))) + 1).cast(
                "int"
            ),
        )
        keep = n - F.ceil(band * n.cast("double")).cast("int")
        variant = F.array_join(
            F.zip_with(
                toks,
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda t, i: F.when(i <= keep, t).otherwise(
                    F.concat(t, F.lit("s"), F.col("doc_id").cast("string"))
                ),
            ),
            " ",
        )
        planted = (F.col("doc_id") % 10 == 1) & F.col("__ptext").isNotNull()
        return (
            j.withColumn("text", F.when(planted, variant).otherwise(F.col("text")))
            .withColumn("n_chars", F.length("text").cast("long"))
            .drop("__ptext")
        )

    return post


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(_REPO, "scratch", "sf1")
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    neardup = "--neardup" in sys.argv[3:] or os.environ.get("SPARK_GRAFT_NEARDUP") == "1"
    src = os.environ.get("SPARK_GRAFT_SRC_SF", "/root/testdata/sf0.1")

    from data_ingestion_project_spark.session import build_session

    spark = build_session("make-scaled-corpus")
    spark.sparkContext.setLogLevel("ERROR")
    build_scaled_corpus(spark, src, out_dir, factor, neardup=neardup)
    print(out_dir)


def build_scaled_corpus(
    spark, src: str, out_dir: str, factor: int, neardup: bool = False
) -> None:
    from pyspark.sql import functions as F

    from data_ingestion_project_spark.sources.readers import table

    os.makedirs(out_dir, exist_ok=True)
    reps = spark.range(factor).select(F.col("id").alias("__r"))

    def replicate(name: str, key_strides: dict[str, int], post=None):
        df = table(spark, src, name)
        # spread the expansion: the source often has only 1-3 parquet
        # files, and factor-1000 runs would otherwise push hundreds of
        # millions of expanded rows through 1-3 scan tasks
        out = df.repartition(32).crossJoin(F.broadcast(reps))
        for col, stride in key_strides.items():
            out = out.withColumn(col, F.col(col) + F.col("__r") * F.lit(stride))
        if post is not None:
            out = post(out)
        out = out.drop("__r").select(*df.columns)
        dest = os.path.join(out_dir, f"{name}.parquet")
        out.repartition(32).write.mode("overwrite").parquet(dest)
        print(f"{name}: {factor}x -> {dest}", file=sys.stderr)

    def stride(name: str, key: str) -> int:
        return table(spark, src, name).agg(F.max(key)).first()[0] + 1

    s_cust = stride("customer", "c_custkey")
    s_ord = stride("orders", "o_orderkey")
    s_supp = stride("supplier", "s_suppkey")
    s_part = stride("part", "p_partkey")
    s_doc = stride("documents", "doc_id")
    s_user = stride("events", "user_id")
    s_evt = stride("events", "event_id")
    s_vec = stride("embeddings", "vec_id")

    replicate(
        "customer",
        {"c_custkey": s_cust},
        post=lambda d: d.withColumn(
            "c_name", F.format_string("Customer#%09d", F.col("c_custkey"))
        ),
    )
    replicate(
        "supplier",
        {"s_suppkey": s_supp},
        post=lambda d: d.withColumn(
            "s_name", F.format_string("Supplier#%09d", F.col("s_suppkey"))
        ),
    )
    replicate("part", {"p_partkey": s_part})
    replicate("orders", {"o_orderkey": s_ord, "o_custkey": s_cust})
    replicate(
        "lineitem",
        {"l_orderkey": s_ord, "l_partkey": s_part, "l_suppkey": s_supp},
    )
    replicate("events", {"event_id": s_evt, "user_id": s_user})
    replicate(
        "documents",
        {"doc_id": s_doc},
        post=_neardup_documents_post(F)
        if neardup
        else lambda d: d.withColumn(
            "text",
            F.when(F.col("__r") == 0, F.col("text")).otherwise(
                F.regexp_replace(
                    "text", r"(\S+)", F.concat(F.lit("$1x"), F.col("__r"))
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long")),
    )
    replicate(
        "embeddings",
        {"vec_id": s_vec},
        post=lambda d: d.withColumn(
            "embedding",
            F.concat(
                F.slice(
                    "embedding", F.col("__r").cast("int") + 1, F.size("embedding")
                ),
                F.slice("embedding", F.lit(1), F.col("__r").cast("int")),
            ),
        ),
    )
    for dim in ("nation", "region"):
        table(spark, src, dim).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{dim}.parquet")
        )
        print(f"{dim}: copied (dimension)", file=sys.stderr)


if __name__ == "__main__":
    main()
