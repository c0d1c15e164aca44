"""Embedding-column analytics: exact ANN baseline, pairwise similarity,
vector stats — the similarity-search surface of the north star.

The exact variants carry DuckDB oracles (list_cosine_similarity over
DOUBLE[] matches our JVM-side double math after rounding). As of round
5 every ANN family's RECALL is also value-exact: lsh_recall /
ivf_recall / pq_recall are md5-deterministic certification twins whose
whole pipeline (quantizer choice, assignment/signature, probe,
rescore, recall arithmetic) replays in DuckDB; the production variants
(seeded Gaussian planes, xxhash+Lloyd quantizers) serve the knn_*
queries and keep pytest floors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_ingestion_project_spark.functions.vectors import cosine_similarity, vec_dot, vec_norm
from data_ingestion_project_spark.queries._precision import dec_avg, floor_round, sql_dec_avg
from data_ingestion_project_spark.operators.similarity import (
    cosine_batch_topk,
    cosine_self_topk_pairs,
    cosine_topk,
    ivf_ann_topk,
    lsh_ann_topk,
    pq_ann_topk,
)
from data_ingestion_project_spark.sources.readers import table

# Fixed query id for the deterministic k-NN queries.
QUERY_VEC_ID = 0


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    return list(row[0])


def knn_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors of vec_id=0: broadcast query vector,
    one codegen'd scan + TakeOrdered — zero shuffles."""
    q = _query_vec(spark, sf_dir)
    corpus = table(spark, sf_dir, "embeddings")
    res = cosine_topk(corpus, q, k=10, exclude_ids=(QUERY_VEC_ID,))
    return res.select("vec_id", F.round("sim", 4).alias("sim"))


ORACLE_KNN_BRUTE_FORCE = f"""
WITH q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
)
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], q.qv), 4) AS sim
FROM embeddings, q
WHERE vec_id <> {QUERY_VEC_ID}
ORDER BY list_cosine_similarity(embedding::DOUBLE[], q.qv) DESC, vec_id ASC
LIMIT 10
"""


def top_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global top-10 most-similar pairs (brute force baseline)."""
    corpus = table(spark, sf_dir, "embeddings")
    res = cosine_self_topk_pairs(corpus, k=10)
    return res.select("id_a", "id_b", F.round("sim", 4).alias("sim"))


ORACLE_TOP_SIMILAR_PAIRS = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) DESC,
         a.vec_id ASC, b.vec_id ASC
LIMIT 10
"""


N_BATCH_QUERIES = 8  # the fixed probe set for the batch retrieval join


def batch_knn_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 neighbors for a BATCH of 8 probe vectors (vec_id
    0-7) — the retrieval-join shape a RAG / eval-probe pipeline runs:
    small query set x full corpus, one ranked answer list per query.
    operators/similarity.cosine_batch_topk broadcasts the probe frame;
    WindowGroupLimit keeps the per-query rank filter below the
    exchange, so the shuffle moves at most k rows per query per input
    partition, never the scored cross product."""
    e = table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = cosine_batch_topk(e, queries, k=5)
    return res.select(
        "query_id", "rank", "vec_id", F.round("sim", 4).alias("sim")
    ).orderBy("query_id", "rank")


ORACLE_BATCH_KNN_SEARCH = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
), scored AS (
  SELECT q.query_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
                    e.vec_id ASC) AS INTEGER) AS rank,
         e.vec_id,
         ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.qv), 4) AS sim
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
)
SELECT query_id, rank, vec_id, sim
FROM scored WHERE rank <= 5
ORDER BY query_id, rank
"""


_MRL_HALF = 32  # truncated prefix length (of 64)
_MRL_K = 10


def matryoshka_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation audit (the MRL question, Kusupati et al.
    2022): if the 64-dim embeddings are truncated to their FIRST 32
    dims — the storage/latency play nested-representation models are
    trained for — how much of each probe's exact top-10 neighbor set
    survives?  Per probe: |top10_full ∩ top10_half| and the retention
    ratio, plus the batch mean — the go/no-go number for shipping
    truncated vectors.

    Plan: two runs of the same broadcast-probe retrieval join
    (operators/similarity.cosine_batch_topk — WindowGroupLimit keeps
    each shuffle at k rows per query per partition), one over the full
    vectors and one over a JVM ``slice`` projection (no Python, no
    second table); the overlap join then touches 2·|probes|·k rows.
    Both rankings replay exactly in DuckDB (same tie-breaks), so the
    audit is value-exact — integer overlaps, exact-ratio retention."""
    e = table(spark, sf_dir, "embeddings")
    probes_full = e.filter(F.col("vec_id") < N_BATCH_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    full = cosine_batch_topk(e, probes_full, k=_MRL_K).select("query_id", "vec_id")
    e_half = e.select(
        "vec_id", F.slice("embedding", 1, _MRL_HALF).alias("embedding")
    )
    probes_half = probes_full.select(
        "query_id", F.slice("query_vec", 1, _MRL_HALF).alias("query_vec")
    )
    half = cosine_batch_topk(e_half, probes_half, k=_MRL_K).select(
        "query_id", "vec_id"
    )
    ov = (
        full.join(half, ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("overlap_k"))
    )
    per = (
        probes_full.select("query_id")
        .join(ov, "query_id", "left")
        .select(
            "query_id", F.coalesce(F.col("overlap_k"), F.lit(0)).alias("overlap_k")
        )
    )
    mean = per.agg(
        F.round(F.sum("overlap_k") / F.lit(N_BATCH_QUERIES * _MRL_K), 4).alias(
            "mean_retention"
        )
    )
    return (
        per.crossJoin(F.broadcast(mean))
        .select(
            "query_id",
            "overlap_k",
            F.round(F.col("overlap_k") / F.lit(_MRL_K), 4).alias("retention"),
            "mean_retention",
        )
        .orderBy("query_id")
    )


ORACLE_MATRYOSHKA_OVERLAP = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_BATCH_QUERIES}
), sf AS (
  SELECT q.query_id, e.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.qv) DESC,
                    e.vec_id ASC) AS rn
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
), tf AS (SELECT query_id, vec_id FROM sf WHERE rn <= {_MRL_K}),
sh AS (
  SELECT q.query_id, e.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(
                      (e.embedding::DOUBLE[])[1:{_MRL_HALF}],
                      (q.qv)[1:{_MRL_HALF}]) DESC,
                    e.vec_id ASC) AS rn
  FROM embeddings e JOIN q ON e.vec_id <> q.query_id
), th AS (SELECT query_id, vec_id FROM sh WHERE rn <= {_MRL_K}),
ov AS (
  SELECT tf.query_id, COUNT(*) AS overlap_k
  FROM tf JOIN th ON tf.query_id = th.query_id AND tf.vec_id = th.vec_id
  GROUP BY tf.query_id
), per AS (
  SELECT q2.query_id, COALESCE(ov.overlap_k, 0) AS overlap_k
  FROM (SELECT DISTINCT query_id FROM q) q2 LEFT JOIN ov USING (query_id)
), m AS (
  SELECT ROUND(SUM(overlap_k) * 1.0 / {N_BATCH_QUERIES * _MRL_K}, 4)
           AS mean_retention
  FROM per
)
SELECT query_id, CAST(overlap_k AS BIGINT) AS overlap_k,
       ROUND(overlap_k * 1.0 / {_MRL_K}, 4) AS retention,
       mean_retention
FROM per CROSS JOIN m
ORDER BY query_id
"""


def label_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label corpus stats: count + mean L2 norm (JVM-side aggregate
    over the array column, no Python)."""
    e = table(spark, sf_dir, "embeddings")
    return (
        e.select("label", vec_norm("embedding").alias("norm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            dec_avg(F.col("norm")).alias("avg_norm"),
        )
        .orderBy("label")
    )


ORACLE_LABEL_VECTOR_STATS = f"""
SELECT label, COUNT(*) AS n_vectors,
       {sql_dec_avg('sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))')}
         AS avg_norm
FROM embeddings GROUP BY label ORDER BY label
"""


def knn_lsh_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via random-hyperplane LSH buckets with
    Hamming-3 multi-probe (rows-only: recall < 1 by design).

    Probe radius is tuned to the corpus: these synthetic embeddings
    have top-neighbor cosine ~0.3 (near-uniform on the sphere), so
    each plane agrees with a true neighbor with p ~ 0.6 only; radius 3
    over 8 planes scans 93/256 ~ 36% of buckets for a measured
    recall@10 of 0.5-0.6 (see lsh_recall + the pytest floor). On
    genuinely clustered corpora (near-dup sim >= 0.8) radius 1 with
    the same planes gives >= 0.9 recall at 3.5% scan."""
    q = _query_vec(spark, sf_dir)
    corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    res = lsh_ann_topk(corpus, q, k=10, n_planes=8, seed=42, probe_hamming=3)
    return res.select("vec_id", F.round("sim", 4).alias("sim"))


def _recall_at_k(exact_ids: DataFrame, approx_ids: DataFrame) -> DataFrame:
    """Shared recall@k frame for every ANN family: |exact ∩ approx| / k
    as (k, n_hit, recall_at_k) — ONE implementation so a fix (e.g.
    zero-denominator handling, a k change) cannot miss a family."""
    hit = exact_ids.join(approx_ids, "vec_id", "left_semi")
    k = exact_ids.agg(F.count(F.lit(1)).alias("k"))
    h = hit.agg(F.count(F.lit(1)).alias("n_hit"))
    return k.crossJoin(h).select(
        "k", "n_hit", F.round(F.col("n_hit") / F.col("k"), 4).alias("recall_at_k")
    )


def lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end VALUE-EXACT recall certification of hyperplane-LSH
    (the ivf_recall/pq_recall posture): the 8 hyperplanes are the 8
    corpus vectors with smallest md5(vec_id) — sign-hash quality only
    needs directions spread over the sphere, and corpus vectors ARE
    such directions, which is what makes the ENTIRE pipeline (plane
    choice, sign-bit signatures, Hamming-3 multi-probe, exact rescore,
    recall@10) replayable in DuckDB. Sign bits threshold the
    integer-micro-unit-quantized dot (CAST(ROUND(×1e6) AS BIGINT) >=
    0), so a last-ulp reassociation cannot flip a bit at the boundary;
    signatures bit-pack to one BIGINT and the Hamming probe is
    bit_count(xor()) <= 3 in both engines — exact integer arithmetic
    end to end. The production path (seeded Gaussian planes,
    operators/similarity.make_planes) keeps serving knn_lsh_approx
    with its pytest floor; what scale exercises — signature scan,
    Hamming filter, rescore — is what this oracle certifies."""
    from pyspark.sql import Window

    n_planes, radius = 8, 3
    e = table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    planes = (
        corpus.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(n_planes)
        .withColumn("p_idx", F.row_number().over(Window.orderBy("__h", "vec_id")) - 1)
        .select("p_idx", F.col("v").alias("p"))
    )
    micro = 1_000_000

    def _sig(df: DataFrame, id_col: str) -> DataFrame:
        bits = df.crossJoin(F.broadcast(planes)).select(
            id_col,
            "p_idx",
            (F.round(vec_dot("v", "p") * micro, 0).cast("long") >= 0).alias("b"),
        )
        return bits.groupBy(id_col).agg(
            F.sum(
                F.col("b").cast("long") * F.pow(F.lit(2), F.col("p_idx")).cast("long")
            ).alias("sig")
        )
    sigs = _sig(corpus, "vec_id")
    qdf = e.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("vec_id").alias("qid"),
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    qsig = _sig(qdf, "qid").select(F.col("sig").alias("qsig"))
    cand = (
        sigs.crossJoin(F.broadcast(qsig))
        .filter(
            F.bit_count(F.col("sig").bitwiseXOR(F.col("qsig"))) <= radius
        )
        .select("vec_id")
    )
    q = _query_vec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    approx = (
        cand.join(corpus, "vec_id")
        .withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    exact = (
        corpus.withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    k = exact.agg(F.count(F.lit(1)).alias("k"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = exact.join(approx, "vec_id", "left_semi").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        k.crossJoin(nc)
        .crossJoin(h)
        .select(
            "k",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.col("k"), 4).alias("recall_at_k"),
        )
    )


ORACLE_LSH_RECALL = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
), planes AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS p_idx, v AS p
  FROM (
    SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v
    FROM corpus ORDER BY 1, 2 LIMIT 8
  ) t
), sigs AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN CAST(ROUND(list_inner_product(v, p) * 1000000, 0) AS BIGINT) >= 0
                  THEN CAST(POW(2, p_idx) AS BIGINT) ELSE 0 END) AS BIGINT) AS sig
  FROM corpus CROSS JOIN planes GROUP BY vec_id
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), qsig AS (
  SELECT CAST(SUM(CASE WHEN CAST(ROUND(list_inner_product(q.qv, p) * 1000000, 0) AS BIGINT) >= 0
                  THEN CAST(POW(2, p_idx) AS BIGINT) ELSE 0 END) AS BIGINT) AS qsig
  FROM planes, q
), cand AS (
  SELECT vec_id FROM sigs, qsig WHERE bit_count(xor(sig, qsig)) <= 3
), approx AS (
  SELECT c.vec_id FROM cand c JOIN corpus USING (vec_id), q
  ORDER BY list_cosine_similarity(corpus.v, q.qv) DESC, c.vec_id ASC LIMIT 10
), exact AS (
  SELECT vec_id FROM corpus, q
  ORDER BY list_cosine_similarity(v, q.qv) DESC, vec_id ASC LIMIT 10
)
SELECT (SELECT COUNT(*) FROM exact) AS k,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) AS n_hit,
       ROUND((SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) * 1.0
             / (SELECT COUNT(*) FROM exact), 4) AS recall_at_k
"""


# Trained coarse-quantizer cache, keyed by corpus dir. An IVF index is
# built ONCE per corpus and amortized over every query (production
# writes the assigned corpus partitioned by list_id); re-training per
# query would bill the index build to each lookup. Deterministic:
# seeded hash-sampled init + fixed iteration count.
_IVF_INDEX: dict[tuple, list[list[float]]] = {}


def _corpus_key(sf_dir: str) -> tuple:
    """Cache key that invalidates when the embeddings parquet is
    regenerated in place (same posture as the events layout cache in
    queries/events.py — a stale index would make the recall
    certifications grade new data against an old quantizer)."""
    import os

    src = os.path.join(sf_dir, "embeddings.parquet")
    return (sf_dir, os.path.getmtime(src) if os.path.exists(src) else None)


def _ivf_index(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    from data_ingestion_project_spark.operators.similarity import ivf_centroids

    key = _corpus_key(sf_dir)
    if key not in _IVF_INDEX:
        corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
        _IVF_INDEX[key] = ivf_centroids(corpus, n_centroids=16, n_iter=2, seed=42)
    return _IVF_INDEX[key]


def knn_ivf_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via the IVF index (spherical-kmeans coarse
    quantizer, probe the 6 nearest of 16 inverted lists = ~38% scan).
    Rows-only: recall < 1 by design; ivf_recall certifies the quality
    against the exact twin and pytest asserts the floor. Probe depth is
    high for the same reason as the LSH variant's radius: these
    synthetic vectors are near-uniform on the sphere (top-neighbor
    cosine ~0.3), so true neighbors spread across many lists; clustered
    real corpora reach the same recall at 1-2 probes."""
    q = _query_vec(spark, sf_dir)
    corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    # training params live in _ivf_index — with prebuilt centroids,
    # ivf_ann_topk never trains, so only k/n_probe matter here
    res = ivf_ann_topk(
        corpus, q, k=10, n_probe=6, centroids=_ivf_index(spark, sf_dir)
    )
    return res.select("vec_id", F.round("sim", 4).alias("sim"))


def ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end VALUE-EXACT recall certification of the IVF machinery
    (VERDICT r4 ask #4, the minhash_recall posture): coarse centroids
    are the 16 corpus vectors with the smallest md5(vec_id) — a seeded
    deterministic sample both engines compute identically — and
    assignment (argmax cosine, ties to the lowest centroid id), probe
    (6 nearest lists to the query), candidate scan, exact rescore, and
    the recall@10 arithmetic are ALL replayed in the DuckDB oracle, so
    the driver certifies that inverted-list search actually finds the
    true neighbors, not merely that it runs. This is the certification
    twin: the production quantizer (seeded-xxhash sample + Lloyd
    iterations in numpy, operators/similarity.ivf_centroids) serves
    knn_ivf_approx / knn_ivf_disk and keeps its pytest recall floor —
    Lloyd lives driver-side on a bounded sample in BOTH postures, so
    what scale actually exercises (assignment + probe + rescore) is
    exactly what this oracle certifies. The N×16 crossJoin+window
    assignment here is the SQL-replayable stand-in for the Arrow
    matmul in ivf_assign; 16 centroid rows broadcast."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = (
        corpus.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(16)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("c"))
    )
    assigned = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "cos", cosine_similarity("v", "c")
    )
    wv = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cent_id").asc())
    inv = (
        assigned.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id", "v")
    )
    q = _query_vec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    probes = (
        cents.withColumn("qcos", cosine_similarity(qlit, "c"))
        .orderBy(F.col("qcos").desc(), F.col("cent_id").asc())
        .limit(6)
        .select("cent_id")
    )
    cand = inv.join(F.broadcast(probes), "cent_id")
    approx = (
        cand.withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    exact = (
        corpus.withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    k = exact.agg(F.count(F.lit(1)).alias("k"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = exact.join(approx, "vec_id", "left_semi").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        k.crossJoin(nc)
        .crossJoin(h)
        .select(
            "k",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.col("k"), 4).alias("recall_at_k"),
        )
    )


ORACLE_IVF_RECALL = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), cents AS (
  SELECT vec_id AS cent_id, v AS c
  FROM corpus ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16
), assigned AS (
  SELECT vec_id, v, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY list_cosine_similarity(v, c) DESC, cent_id ASC) AS rn
  FROM corpus CROSS JOIN cents
), inv AS (
  SELECT vec_id, v, cent_id FROM assigned WHERE rn = 1
), probes AS (
  SELECT cent_id FROM cents, q
  ORDER BY list_cosine_similarity(c, q.qv) DESC, cent_id ASC LIMIT 6
), cand AS (
  SELECT i.vec_id, i.v FROM inv i JOIN probes p USING (cent_id)
), approx AS (
  SELECT vec_id FROM cand, q
  ORDER BY list_cosine_similarity(v, q.qv) DESC, vec_id ASC LIMIT 10
), exact AS (
  SELECT vec_id FROM corpus, q
  ORDER BY list_cosine_similarity(v, q.qv) DESC, vec_id ASC LIMIT 10
)
SELECT (SELECT COUNT(*) FROM exact) AS k,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) AS n_hit,
       ROUND((SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) * 1.0
             / (SELECT COUNT(*) FROM exact), 4) AS recall_at_k
"""


def ivf_disk_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per corpus mtime) the ON-DISK IVF index: the
    assigned corpus written ``partitionBy(list_id)`` — each inverted
    list is a partition directory, the 100 TB layout where a probe
    reads n_probe/n_centroids of the data via PLANNING-time partition
    pruning (same materialize-once posture as the day-partitioned
    events layout)."""
    import os

    from data_ingestion_project_spark.operators.materialize import (
        dataset_tag,
        ensure_materialized,
    )
    from data_ingestion_project_spark.operators.similarity import write_ivf_index

    abs_dir = os.path.abspath(os.path.normpath(sf_dir))

    def _build(tmp: str) -> None:
        corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
        write_ivf_index(corpus, _ivf_index(spark, sf_dir), tmp)

    return ensure_materialized(
        f"ivf_index_{dataset_tag(abs_dir)}",
        os.path.join(abs_dir, "embeddings.parquet"),
        _build,
    )


def knn_ivf_disk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 served from the PREBUILT on-disk IVF index
    (operators/similarity.write_ivf_index / ivf_probe_topk): pick the 6
    nearest of 16 centroids driver-side, scan ONLY those 6 list-id
    partition directories (pruned at planning time — pinned by
    test_plan_shapes), exact-rescore the candidates. Identical probe
    set and scoring to knn_ivf_approx, so its results — and therefore
    ivf_recall's pytest floor — apply verbatim; the equality is pinned
    in pytest. Rows-only (recall < 1 by design)."""
    from data_ingestion_project_spark.operators.similarity import ivf_probe_topk

    q = _query_vec(spark, sf_dir)
    res = ivf_probe_topk(
        spark,
        ivf_disk_index_path(spark, sf_dir),
        q,
        centroids=_ivf_index(spark, sf_dir),
        k=10,
        n_probe=6,
    )
    return res.select("vec_id", F.round("sim", 4).alias("sim"))


_PQ_BOOKS: dict = {}


def _pq_index(spark: SparkSession, sf_dir: str) -> list[list[list[float]]]:
    from data_ingestion_project_spark.operators.similarity import pq_codebooks

    key = _corpus_key(sf_dir)
    if key not in _PQ_BOOKS:
        corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
        _PQ_BOOKS[key] = pq_codebooks(corpus, m=8, ksub=16, n_iter=3, seed=42)
    return _PQ_BOOKS[key]


def knn_pq_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10 via product quantization + asymmetric distance
    (operators/similarity.py::pq_ann_topk): byte codes + an m x ksub
    query lookup table stand in for the float vectors, with an exact
    rescore of the 100 widest ADC candidates. Rows-only (quantization
    error is by construction); pq_recall certifies quality against the
    exact twin and pytest asserts the floor."""
    q = _query_vec(spark, sf_dir)
    corpus = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    res = pq_ann_topk(corpus, q, k=10, rerank=100, codebooks=_pq_index(spark, sf_dir))
    return res.select("vec_id", F.round("sim", 4).alias("sim"))


def pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end VALUE-EXACT recall certification of the PQ-ADC
    machinery (the ivf_recall posture applied to product quantization):
    codebooks are the 16 md5-chosen unit vectors' subvectors per
    subspace (8 subspaces × 8 dims — the deterministic 0-Lloyd
    certification quantizer), and encoding (per-subspace argmin L2 ≡
    argmax x·c − ||c||²/2), the query ADC lookup table, the LUT-sum
    candidate stage, rerank-100 exact rescore, and recall@10 are ALL
    replayed in DuckDB. Cross-engine exactness: per-subspace scores
    and LUT entries are quantized to integer micro-units
    (CAST(ROUND(×1e6) AS BIGINT)) BEFORE argmin/summation, so code
    assignment and ADC ordering are integer-exact in both engines —
    float-sum reassociation cannot flip a codeword or a candidate.
    The production codebooks (xxhash sample + per-subspace Lloyd,
    operators/similarity.pq_codebooks) keep serving knn_pq_approx with
    their pytest recall floor; what scale exercises — encode, LUT
    scan, rerank — is exactly what this oracle certifies."""
    from pyspark.sql import Window

    m, ksub, dsub, rerank = 8, 16, 8, 100
    e = table(spark, sf_dir, "embeddings")
    corpus = (
        e.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
        .withColumn("nrm", F.sqrt(vec_dot("v", "v")))
    )
    units = corpus.select(
        "vec_id",
        F.transform("v", lambda x: x / F.col("nrm")).alias("u"),
        "v",
    )
    cents = (
        units.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(ksub)
        .withColumn(
            "c_idx", F.row_number().over(Window.orderBy("__h", "vec_id")) - 1
        )
        .select("c_idx", "u")
    )
    s_col = F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s")
    cw = cents.select("c_idx", "u", s_col).select(
        "s",
        "c_idx",
        F.slice("u", F.col("s") * dsub + 1, dsub).alias("cs"),
    ).withColumn("cnorm2", vec_dot("cs", "cs"))
    xs = units.select("vec_id", s_col, "u").select(
        "vec_id", "s", F.slice("u", F.col("s") * dsub + 1, dsub).alias("xs")
    )
    micro = 1_000_000
    scored = xs.join(F.broadcast(cw), "s").select(
        "vec_id",
        "s",
        "c_idx",
        F.round((vec_dot("xs", "cs") - 0.5 * F.col("cnorm2")) * micro, 0)
        .cast("long")
        .alias("score_i"),
    )
    # r12: per-(vec, subspace) argmax as a PARTIAL-AGGREGABLE struct
    # max (score_i desc, c_idx asc on ties ≡ max(score_i, -c_idx)) —
    # the row_number window it replaces sorted the full corpus×m×ksub
    # scored frame (~10 M rows at sf0.1) to keep one row in 16; the
    # agg map-side-combines to corpus×m rows before the exchange
    code = (
        scored.groupBy("vec_id", "s")
        .agg(
            F.max(
                F.struct(
                    F.col("score_i").alias("si"),
                    (-F.col("c_idx")).alias("nci"),
                )
            ).alias("__m")
        )
        .select("vec_id", "s", (-F.col("__m.nci")).cast("int").alias("c_idx"))
    )
    qunit = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.transform("embedding", lambda x: x.cast("double")).alias("qv"))
        .withColumn("qn", F.sqrt(vec_dot("qv", "qv")))
        .select(F.transform("qv", lambda x: x / F.col("qn")).alias("qu"))
    )
    lut = qunit.select(s_col, "qu").select(
        "s",
        F.slice("qu", F.col("s") * dsub + 1, dsub).alias("qs"),
    ).join(F.broadcast(cw), "s").select(
        "s",
        "c_idx",
        F.round(vec_dot("qs", "cs") * micro, 0).cast("long").alias("lut_i"),
    )
    adc = (
        code.join(F.broadcast(lut), ["s", "c_idx"])
        .groupBy("vec_id")
        .agg(F.sum("lut_i").alias("adc_i"))
    )
    cand = adc.orderBy(F.col("adc_i").desc(), F.col("vec_id").asc()).limit(rerank)
    q = _query_vec(spark, sf_dir)
    qlit = F.array(*[F.lit(float(x)) for x in q])
    approx = (
        cand.join(corpus.select("vec_id", "v"), "vec_id")
        .withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    exact = (
        corpus.withColumn("qcos", cosine_similarity("v", qlit))
        .orderBy(F.col("qcos").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id")
    )
    k = exact.agg(F.count(F.lit(1)).alias("k"))
    nc = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    h = exact.join(approx, "vec_id", "left_semi").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        k.crossJoin(nc)
        .crossJoin(h)
        .select(
            "k",
            "n_candidates",
            "n_hit",
            F.round(F.col("n_hit") / F.col("k"), 4).alias("recall_at_k"),
        )
    )


ORACLE_PQ_RECALL = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
), units AS (
  SELECT vec_id, list_transform(v, x -> x / sqrt(list_inner_product(v, v))) AS u, v
  FROM corpus
), cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS c_idx, u
  FROM (
    SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, u
    FROM units ORDER BY 1, 2 LIMIT 16
  ) t
), subs AS (
  SELECT unnest(range(8)) AS s
), cw AS (
  SELECT s, c_idx, u[(s*8+1):(s*8+8)] AS cs,
         list_inner_product(u[(s*8+1):(s*8+8)], u[(s*8+1):(s*8+8)]) AS cnorm2
  FROM cents CROSS JOIN subs
), xs AS (
  SELECT vec_id, s, u[(s*8+1):(s*8+8)] AS xs FROM units CROSS JOIN subs
), scored AS (
  SELECT vec_id, s, c_idx,
         CAST(ROUND((list_inner_product(xs, cs) - 0.5 * cnorm2) * 1000000, 0) AS BIGINT)
           AS score_i
  FROM xs JOIN cw USING (s)
), code AS (
  SELECT vec_id, s, c_idx FROM (
    SELECT vec_id, s, c_idx,
           ROW_NUMBER() OVER (PARTITION BY vec_id, s
             ORDER BY score_i DESC, c_idx ASC) AS rn
    FROM scored
  ) t WHERE rn = 1
), qunit AS (
  SELECT list_transform(embedding::DOUBLE[],
           x -> x / sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS qu
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), lut AS (
  SELECT s, c_idx,
         CAST(ROUND(list_inner_product(qu[(s*8+1):(s*8+8)], cs) * 1000000, 0) AS BIGINT)
           AS lut_i
  FROM cw CROSS JOIN qunit
), adc AS (
  SELECT vec_id, SUM(lut_i) AS adc_i
  FROM code JOIN lut USING (s, c_idx) GROUP BY vec_id
), cand AS (
  SELECT vec_id FROM adc ORDER BY adc_i DESC, vec_id ASC LIMIT 100
), q AS (
  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
), approx AS (
  SELECT c.vec_id FROM cand c JOIN corpus USING (vec_id), q
  ORDER BY list_cosine_similarity(corpus.v, q.qv) DESC, c.vec_id ASC LIMIT 10
), exact AS (
  SELECT vec_id FROM corpus, q
  ORDER BY list_cosine_similarity(v, q.qv) DESC, vec_id ASC LIMIT 10
)
SELECT (SELECT COUNT(*) FROM exact) AS k,
       (SELECT COUNT(*) FROM cand) AS n_candidates,
       (SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) AS n_hit,
       ROUND((SELECT COUNT(*) FROM exact SEMI JOIN approx USING (vec_id)) * 1.0
             / (SELECT COUNT(*) FROM exact), 4) AS recall_at_k
"""


def embedding_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster profile of the embedding corpus: per inverted
    list (the 16 spherical-kmeans clusters behind the IVF index) the
    member count, mean within-cluster cosine to the centroid (cluster
    tightness), and the dominant class label with its share — the
    topic-clustering / cluster-balanced-curation view of the corpus
    (SemDeDup and cluster-stratified sampling both start exactly
    here). Reuses the cached corpus quantizer (_ivf_index), so the
    k-means training cost is amortized across the whole ANN family;
    the per-vector pass is one Arrow-batched assignment + one
    aggregation shuffle. Rows-only: the quantizer is driver-side
    k-means (not SQL-expressible); determinism (seeded init, argmax
    tie-break) and the size-reconciliation invariant are pinned in
    pytest."""
    from pyspark.sql import Window

    from data_ingestion_project_spark.operators.similarity import ivf_assign

    from data_ingestion_project_spark.queries._precision import DEC_BUF, MICRO, to_micro

    cents = _ivf_index(spark, sf_dir)
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    # Literal centroid matrix → per-row cosine to own centroid stays
    # JVM-side (element_at over an array-of-arrays literal).
    cmat = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in cents])
    assigned = ivf_assign(e, cents).select(
        "list_id",
        "label",
        cosine_similarity(
            F.col("embedding"), F.element_at(cmat, F.col("list_id") + 1)
        ).alias("cos_to_centroid"),
    )
    # ONE corpus pass: the (list, label) cell rollup carries count +
    # exact micro-unit cosine partials; sizes and the dominant label
    # both re-aggregate the cell frame (16 x |labels| rows), so the
    # Arrow assignment UDF and the scan run exactly once. Decimal
    # partials are associative, so the two-level mean equals dec_avg's
    # single-pass value bit-for-bit.
    cell = assigned.groupBy("list_id", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(to_micro(F.col("cos_to_centroid")).cast(DEC_BUF)).alias("micro"),
    )
    sizes = cell.groupBy("list_id").agg(
        F.sum("n").alias("n_vectors"),
        F.round(
            F.sum("micro").cast("double") / F.lit(float(MICRO)) / F.sum("n"), 4
        ).alias("avg_cos_to_centroid"),
    )
    w = Window.partitionBy("list_id").orderBy(F.col("n").desc(), F.col("label").asc())
    top = (
        cell.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("list_id", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    return (
        sizes.join(top, "list_id")
        .select(
            "list_id",
            "n_vectors",
            "avg_cos_to_centroid",
            "top_label",
            F.round(F.col("top_n") / F.col("n_vectors"), 4).alias("top_label_share"),
        )
        .orderBy("list_id")
    )


def semdedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup accounting over the corpus plus 50 PLANTED semantic
    duplicates (each a scaled copy of an existing vector — cosine is
    scale-invariant, so similarity is exactly 1.0): cluster-bounded
    pairwise search (operators/semdedup.py) must drop precisely the
    planted copies on this near-uniform corpus. Runs with the
    production ``max_cluster_size`` valve engaged — on a skewed corpus
    a degenerate k-means cluster becomes bounded block-pair tasks
    instead of one O(n_c²) matmul; the valve is exact, so the output
    is identical with or without it (pinned in pytest).

    Oracle (r10): the DuckDB twin computes the EXACT all-pairs
    cosine-threshold dedup (drop = larger id of any pair >= 0.95,
    matching semdedup's keep-lowest-id rule), so certification asserts
    the cluster-bounded search achieves EXACT RECALL here — planted
    copies share their source's direction, hence its argmax-cosine
    cluster (ivf_assign normalizes before the centroid argmax), and
    the corpus-wide cosine margin is wide (planted pairs at 1.0,
    next-closest pair ~0.51 at sf0.01 — no cross-engine float
    boundary). The driver-side k-means quantizer affects only WHERE
    pairs are searched, never the certified output."""
    from data_ingestion_project_spark.operators.semdedup import semdedup

    e = table(spark, sf_dir, "embeddings")
    planted = (
        e.filter(F.col("vec_id") < 50)
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
            "label",
        )
    )
    corpus = e.unionByName(planted)
    kept = semdedup(corpus, threshold=0.95, n_clusters=16, max_cluster_size=4096)
    n_input = corpus.agg(F.count(F.lit(1)).alias("n_input"))
    stats = kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("vec_id") >= 1_000_000).cast("long")).alias("planted_kept"),
    )
    return n_input.crossJoin(stats).select(
        "n_input",
        "n_kept",
        (F.col("n_input") - F.col("n_kept")).alias("n_dropped"),
        "planted_kept",
    )


# Exact all-pairs threshold dedup — the ground truth the cluster-
# bounded search must reproduce on this corpus (see the query
# docstring for the margin argument).
ORACLE_SEMDEDUP_SUMMARY = """
WITH c AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 0.5) AS v
  FROM embeddings WHERE vec_id < 50
), drops AS (
  SELECT DISTINCT b.vec_id
  FROM c a JOIN c b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.95
)
SELECT (SELECT COUNT(*) FROM c) AS n_input,
       (SELECT COUNT(*) FROM c) - (SELECT COUNT(*) FROM drops) AS n_kept,
       (SELECT COUNT(*) FROM drops) AS n_dropped,
       (SELECT COUNT(*) FROM c
        WHERE vec_id >= 1000000
          AND vec_id NOT IN (SELECT vec_id FROM drops)) AS planted_kept
"""


def modality_dedup_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal dedup QA: do the SEMANTIC near-dup pairs (embedding
    cosine >= 0.95 over the docs' vectors) agree with the LEXICAL ones
    (exact word-set Jaccard >= 0.5 on the text)? One row: pair counts
    per modality, the intersection, and each side's exclusive pairs —
    the audit a pipeline runs before trusting embedding-space dedup to
    replace (or augment) token-space dedup. High semantic-only counts
    mean paraphrase duplication token methods miss; high lexical-only
    counts mean the embedding space is too coarse at this threshold.

    Exactness: both sides are EXACT all-pairs baselines (this is the
    audit, not the scale path — bench-excluded like the other exact
    quadratic baselines; the scale path is comparing the SemDeDup and
    MinHash candidate outputs instead). Cosine is rounded to 6
    decimals BEFORE thresholding on both engines, so 1-ulp libm
    differences cannot flip membership away from rounding boundaries;
    the Jaccard threshold compares exact integer ratios."""
    from data_ingestion_project_spark.operators.dedup import jaccard_pairs

    d = table(spark, sf_dir, "documents")
    e = table(spark, sf_dir, "embeddings")
    lex = jaccard_pairs(d, min_jaccard=0.5).select("id_a", "id_b")
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    sem = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_similarity("va", "vb"), 6))
        .filter(F.col("sim") >= 0.95)
        .select("id_a", "id_b")
    )
    both = sem.join(lex, ["id_a", "id_b"])
    return (
        sem.agg(F.count(F.lit(1)).alias("n_semantic"))
        .crossJoin(F.broadcast(lex.agg(F.count(F.lit(1)).alias("n_lexical"))))
        .crossJoin(F.broadcast(both.agg(F.count(F.lit(1)).alias("n_both"))))
        .select(
            "n_semantic",
            "n_lexical",
            "n_both",
            (F.col("n_semantic") - F.col("n_both")).alias("n_semantic_only"),
            (F.col("n_lexical") - F.col("n_both")).alias("n_lexical_only"),
        )
    )


def modality_agreement_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bench-included SCALE twin of modality_dedup_agreement
    (VERDICT r4 ask #7): instead of the audit's two exact all-pairs
    baselines, this compares the CANDIDATE OUTPUTS of the two
    maintained dedup families — banded MinHash-LSH served from the
    materialized signature/word-set asset (token modality) vs SemDeDup
    cluster-bounded cosine pairs under the cached corpus quantizer
    (embedding modality) — which is exactly the comparison a 100 TB
    pipeline can afford: both sides are equi-join/cluster-bucketed with
    degenerate-bucket caps, no quadratic stage anywhere.

    Because the natural synthetic corpus has ZERO near-dup pairs at
    both thresholds (the exact audit returns all zeros), the twin
    plants 50 cross-modal duplicates in-query — doc i < 50 gets a text
    copy (identical word set) AND a scaled vector copy (cosine exactly
    1.0) under id i + 1_000_000 — so the agreement numbers measure
    whether the two candidate generators actually FIND and AGREE ON
    real duplicates. The planted texts ride the incremental-asset
    posture: minhash_signatures signs ONLY the 50-doc batch and unions
    it with the materialized corpus asset (the update_signature_assets
    shape), never re-signing the corpus. The lexical side is the raw
    capped CANDIDATE set (operators/dedup.minhash_band_candidates) —
    candidate-coverage is the agreement a pipeline audits ("would the
    token path have surfaced this semantic near-dup at all?"), and
    skipping the word-set read keeps the query signature-only end to
    end. Rows-only (xxhash signatures + driver-side k-means are not
    SQL-expressible); the planted agreement floor is pinned in
    pytest.

    Bench note: at sf0.1 this query is STAGE-FLOOR bound, not data
    bound — ~8 sequential exchanges (sign batch, band explode, valve
    agg, candidate join, distinct, cluster pairs, agreement join,
    final agg) over frames of at most ~26k rows, each paying the
    local-mode scheduling floor. At 100 TB every one of those stages
    does proportional work, which is exactly the shape the audit
    needs; the ~2.4 s local number prices stage count, not the
    algorithm."""
    from data_ingestion_project_spark.operators.dedup import (
        minhash_band_candidates,
        minhash_signatures,
    )
    from data_ingestion_project_spark.operators.semdedup import semdedup_pairs
    from data_ingestion_project_spark.queries.documents import _minhash_assets_path

    n_plant, offset = 50, 1_000_000
    e = table(spark, sf_dir, "embeddings")
    d = table(spark, sf_dir, "documents")
    # the embedded universe: docs that carry a vector (vec_id aligns
    # with doc_id by generator contract) — both modalities exist here
    emb_ids = e.select(F.col("vec_id").alias("doc_id"))

    planted_docs = (
        d.join(F.broadcast(emb_ids.filter(F.col("doc_id") < n_plant)), "doc_id", "left_semi")
        .filter(F.col("doc_id") < n_plant)
        .select((F.col("doc_id") + offset).alias("doc_id"), "text")
    )
    # candidate-set comparison needs SIGNATURES only: the asset scan
    # prunes the words column, and the batch signs via the same seeded
    # family — no word-set read, no rescore join, anywhere
    assets = spark.read.parquet(_minhash_assets_path(spark, sf_dir)).join(
        emb_ids, "doc_id", "left_semi"
    )
    allsig = assets.select("doc_id", "signature").unionByName(
        minhash_signatures(planted_docs, "text", "doc_id", num_perm=32)
    )
    lex = minhash_band_candidates(
        allsig, num_perm=32, bands=8, max_bucket_size=50
    )

    planted_vecs = e.filter(F.col("vec_id") < n_plant).select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(0.5)).alias("embedding"),
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted_vecs)
    sem = semdedup_pairs(
        corpus,
        threshold=0.95,
        n_clusters=16,
        centroids=_ivf_index(spark, sf_dir),
        max_cluster_size=4096,
    ).select("id_a", "id_b")

    # ONE pass per side: all three counts from a single full-outer
    # join + aggregate — the audit's three-aggregate form (count sem,
    # count lex, count intersection) would recompute each candidate
    # generator twice, doubling the query's work for the same numbers
    j = sem.withColumn("in_sem", F.lit(1)).join(
        lex.withColumn("in_lex", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return j.agg(
        F.coalesce(F.sum("in_sem"), F.lit(0)).alias("n_semantic"),
        F.coalesce(F.sum("in_lex"), F.lit(0)).alias("n_lexical"),
        F.coalesce(F.sum(F.col("in_sem") * F.col("in_lex")), F.lit(0)).alias("n_both"),
    ).select(
        "n_semantic",
        "n_lexical",
        "n_both",
        (F.col("n_semantic") - F.col("n_both")).alias("n_semantic_only"),
        (F.col("n_lexical") - F.col("n_both")).alias("n_lexical_only"),
    )


ORACLE_MODALITY_DEDUP_AGREEMENT = """
WITH words AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), '\\s+'))) AS word
  FROM documents
), sizes AS (
  SELECT doc_id, COUNT(*) AS set_size FROM words GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_common
  FROM words a JOIN words b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
), lex AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE n_common * 1.0 / (sa.set_size + sb.set_size - n_common) >= 0.5
), sem AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.95
), agree AS (
  SELECT id_a, id_b FROM sem INTERSECT SELECT id_a, id_b FROM lex
)
SELECT (SELECT COUNT(*) FROM sem) AS n_semantic,
       (SELECT COUNT(*) FROM lex) AS n_lexical,
       (SELECT COUNT(*) FROM agree) AS n_both,
       (SELECT COUNT(*) FROM sem) - (SELECT COUNT(*) FROM agree) AS n_semantic_only,
       (SELECT COUNT(*) FROM lex) - (SELECT COUNT(*) FROM agree) AS n_lexical_only
"""



def embedding_covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed covariance pass certified VALUE-EXACTLY: the
    full 64x64 upper triangle (2080 cells) of the n^2-scaled integer
    covariance n*Sxy - Sx*Sy over 1e-4-quantized embedding values
    (operators/pca.covariance_cells - one codegen'd per-row triangle
    expansion + one 2080-cell aggregation, no self-join; the moments
    are exact BIGINTs, so partition order cannot move a bit). This is
    the gate for the PCA family: pca_model consumes exactly these
    cells, so a wrong quantization, a missed pair, or a lost partial
    here is a wrong model there. DuckDB replays quantization, triangle,
    moments and the scaled combination cell-for-cell."""
    from data_ingestion_project_spark.operators.pca import covariance_cells

    e = table(spark, sf_dir, "embeddings")
    return covariance_cells(e, "embedding", dim=64).orderBy("i", "j")


ORACLE_EMBEDDING_COVARIANCE_STATS = """
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT)) AS v
  FROM embeddings
), pairs AS (
  SELECT i, j, SUM(v[i + 1] * v[j + 1]) AS sxy
  FROM q, range(64) r1(i), range(64) r2(j)
  WHERE j >= i GROUP BY i, j
), marg AS (
  SELECT i, SUM(v[i + 1]) AS sx FROM q, range(64) r(i) GROUP BY i
), nn AS (SELECT COUNT(*) AS n FROM q)
SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
       CAST(nn.n * p.sxy - mi.sx * mj.sx AS BIGINT) AS cov_scaled
FROM pairs p JOIN marg mi ON mi.i = p.i JOIN marg mj ON mj.i = p.j, nn
ORDER BY i, j
"""


def pca_variance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA fit audit (rows-only - eigendecomposition is not SQL): fit
    k=8 components on the certified covariance cells (pca_model: 2080
    integer cells to the driver, numpy eigh on the 64x64 matrix -
    driver work bounded by DIMENSION, the IVF-training posture) and
    report per component the explained-variance ratio and the leading
    dimension. Deterministic (sign-convention-fixed eigenvectors over
    exact integer moments); the linear-algebra invariants - ratios
    decreasing, orthonormal components, projected covariance diagonal
    - are pinned in pytest where an oracle cannot reach."""
    from data_ingestion_project_spark.operators.pca import pca_model

    e = table(spark, sf_dir, "embeddings")
    comps, ratio, _mean = pca_model(e, "embedding", dim=64, k=8)
    rows = [
        (c, round(ratio[c], 4), max(range(64), key=lambda d: abs(comps[c][d])))
        for c in range(8)
    ]
    return spark.createDataFrame(
        rows, "component int, explained_ratio double, lead_dim int"
    ).orderBy("component")

_DB_Q = 10_000  # embedding coordinates quantized to 1e-4 integer units
_DB_CENTS = 16


def embedding_davies_bouldin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies–Bouldin clustering-quality census of the embedding space
    under the md5-deterministic 16-centroid IVF assignment (the
    ivf_recall quantizer): per cluster, its size, RMS scatter around
    its MEAN vector, the distance to and id of its worst-ratio
    neighbor, the DB term max_j (s_i+s_j)/d_ij, and the global DB
    index (lower = tighter, better-separated clusters) — the
    quality-scoring companion to embedding_cluster_stats, fully
    SQL-replayable where that one is rows-only.

    Scale/exactness: coordinates quantize to integer 1e-4 units at the
    ONE corpus pass (posexplode → 16×64 integer moment cells: Σq and
    Σq², the pca.py posture — map-side combined, nothing downstream
    grows with the corpus).  Mean, per-cluster scatter (Σq²/n − Σμ²,
    the trace identity — no second pass over members), all 16×16
    centroid distances, and the DB maxima are derived on the
    cell/centroid frames from exact integer sums via deterministic
    IEEE ops (sqrt is correctly-rounded, shared by both engines)."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = (
        corpus.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(_DB_CENTS)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("c"))
    )
    assigned = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "cos", cosine_similarity("v", "c")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cent_id").asc()
    )
    inv = (
        assigned.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cent_id", "v")
    )
    qcell = inv.select(
        "cent_id",
        F.posexplode("v").alias("dim", "x"),
    ).select(
        "cent_id",
        "dim",
        (F.col("x") * F.lit(float(_DB_Q))).cast("long").alias("q"),
    )
    cells = qcell.groupBy("cent_id", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    ).localCheckpoint(eager=True)
    # per-cluster scatter via the trace identity with an EXACT integer
    # numerator: n²·var = Σ_d (n·Σq² − (Σq)²) — a 64-term double sum
    # here would be order-dependent across engines.  Each factor is
    # cast to DECIMAL(38,0) BEFORE the product (the chisq_event_dow
    # cast-first rule): with ~1e8-magnitude per-dim sq2 cells, n·sq2
    # wraps int64 near ~3e5 members per cluster while DuckDB's
    # HUGEINT would not.
    _d38 = "decimal(38,0)"
    per = (
        cells.groupBy("cent_id")
        .agg(
            F.max("n").cast("long").alias("n_members"),
            F.sum(
                F.col("n").cast(_d38) * F.col("sq2").cast(_d38)
                - F.col("sq").cast(_d38) * F.col("sq").cast(_d38)
            ).alias("vnum"),
        )
        .select(
            "cent_id",
            "n_members",
            (
                F.sqrt(F.col("vnum").cast("double"))
                / F.col("n_members").cast("double")
                / F.lit(float(_DB_Q))
            ).alias("s"),
        )
    )
    a = cells.select("cent_id", "dim", "n", "sq")
    b = a.select(
        F.col("cent_id").alias("cent_j"),
        "dim",
        F.col("n").alias("n_j"),
        F.col("sq").alias("sq_j"),
    )
    # centroid distance with exact cross-multiplied numerator:
    # (n_i·n_j)²·d² = Σ_d (sq_i·n_j − sq_j·n_i)², folded in DECIMAL —
    # again cast-first: sq_i·n_j (and n_i·n_j below) wrap int64 at
    # large cluster sizes before a cast-after-product would see them.
    diff = F.col("sq").cast(_d38) * F.col("n_j").cast(_d38) - F.col("sq_j").cast(
        _d38
    ) * F.col("n").cast(_d38)
    dist = (
        a.join(b, "dim")
        .filter(F.col("cent_id") != F.col("cent_j"))
        .groupBy("cent_id", "cent_j")
        .agg(
            F.sum(diff * diff).alias("dnum"),
            F.max(F.col("n").cast(_d38) * F.col("n_j").cast(_d38)).alias("nn"),
        )
        .select(
            "cent_id",
            "cent_j",
            (
                F.sqrt(F.col("dnum").cast("double"))
                / F.col("nn").cast("double")
                / F.lit(float(_DB_Q))
            ).alias("d"),
        )
    )
    pi = per.select(F.col("cent_id"), F.col("s"), F.col("n_members"))
    pj = per.select(F.col("cent_id").alias("cent_j"), F.col("s").alias("s_j"))
    ratio = (
        dist.join(F.broadcast(pi), "cent_id")
        .join(F.broadcast(pj), "cent_j")
        .select(
            "cent_id",
            "n_members",
            "s",
            "cent_j",
            "d",
            ((F.col("s") + F.col("s_j")) / F.col("d")).alias("r"),
        )
    )
    wr = Window.partitionBy("cent_id").orderBy(
        F.col("r").desc(), F.col("cent_j").asc()
    )
    worst = ratio.withColumn("rn", F.row_number().over(wr)).filter(F.col("rn") == 1)
    # the 16-term DB mean would be an order-dependent double sum too:
    # quantize each ratio to 1e-9 integers first
    k = worst.agg(F.count(F.lit(1)).alias("k"))
    db = worst.crossJoin(F.broadcast(k)).agg(
        (
            F.sum((F.col("r") * F.lit(1.0e9)).cast("long")).cast("double")
            / F.max("k").cast("double")
            / F.lit(1.0e9)
        ).alias("db_raw")
    )
    return (
        worst.crossJoin(F.broadcast(db))
        .select(
            "cent_id",
            "n_members",
            floor_round(F.col("s"), 6).alias("scatter_rms"),
            F.col("cent_j").alias("worst_neighbor"),
            floor_round(F.col("d"), 6).alias("neighbor_dist"),
            floor_round(F.col("r"), 6).alias("db_term"),
            floor_round(F.col("db_raw"), 6).alias("db_index"),
        )
        .orderBy("cent_id")
    )


ORACLE_EMBEDDING_DAVIES_BOULDIN = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}
), cents AS (
  SELECT vec_id AS cent_id, v AS c
  FROM corpus ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_DB_CENTS}
), assigned AS (
  SELECT vec_id, v, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY list_cosine_similarity(v, c) DESC, cent_id ASC) AS rn
  FROM corpus CROSS JOIN cents
), inv AS (
  SELECT vec_id, v, cent_id FROM assigned WHERE rn = 1
), qcell AS (
  SELECT cent_id, g.dim AS dim,
         CAST(trunc(v[g.dim] * {_DB_Q}.0) AS BIGINT) AS q
  FROM inv CROSS JOIN generate_series(1, 64) g(dim)
), cells AS (
  SELECT cent_id, dim, COUNT(*) AS n, SUM(q) AS sq, SUM(q * q) AS sq2
  FROM qcell GROUP BY 1, 2
), per AS (
  SELECT cent_id, CAST(MAX(n) AS BIGINT) AS n_members,
         sqrt(CAST(SUM(CAST(n AS HUGEINT) * CAST(sq2 AS HUGEINT)
                       - CAST(sq AS HUGEINT) * CAST(sq AS HUGEINT)) AS DOUBLE))
           / CAST(MAX(n) AS DOUBLE) / {_DB_Q}.0 AS s
  FROM cells GROUP BY 1
), dist AS (
  SELECT a.cent_id, b.cent_id AS cent_j,
         sqrt(CAST(SUM((CAST(a.sq AS HUGEINT) * CAST(b.n AS HUGEINT)
                        - CAST(b.sq AS HUGEINT) * CAST(a.n AS HUGEINT))
                       * (CAST(a.sq AS HUGEINT) * CAST(b.n AS HUGEINT)
                          - CAST(b.sq AS HUGEINT) * CAST(a.n AS HUGEINT))) AS DOUBLE))
           / CAST(MAX(CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)) AS DOUBLE)
           / {_DB_Q}.0 AS d
  FROM cells a JOIN cells b ON a.dim = b.dim AND a.cent_id <> b.cent_id
  GROUP BY 1, 2
), ratio AS (
  SELECT d.cent_id, pi.n_members, pi.s, d.cent_j, d.d,
         (pi.s + pj.s) / d.d AS r
  FROM dist d
  JOIN per pi ON pi.cent_id = d.cent_id
  JOIN per pj ON pj.cent_id = d.cent_j
), worst AS (
  SELECT * FROM (
    SELECT ratio.*,
           ROW_NUMBER() OVER (PARTITION BY cent_id
             ORDER BY r DESC, cent_j ASC) AS rn
    FROM ratio
  ) WHERE rn = 1
), db AS (
  SELECT CAST(SUM(CAST(trunc(r * 1e9) AS BIGINT)) AS DOUBLE)
           / CAST(COUNT(*) AS DOUBLE) / 1e9 AS db_raw
  FROM worst
)
SELECT cent_id, n_members,
       sign(s) * floor(abs(s) * 1000000.0 + 0.5) / 1000000.0 AS scatter_rms,
       cent_j AS worst_neighbor,
       sign(d) * floor(abs(d) * 1000000.0 + 0.5) / 1000000.0 AS neighbor_dist,
       sign(r) * floor(abs(r) * 1000000.0 + 0.5) / 1000000.0 AS db_term,
       sign(db_raw) * floor(abs(db_raw) * 1000000.0 + 0.5) / 1000000.0 AS db_index
FROM worst CROSS JOIN db
ORDER BY cent_id
"""


def decision_stump_splits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best axis-aligned label split per embedding dimension, top-10
    dimensions by Gini gain — the histogram-based split scan
    (operators/stump.py, the LightGBM-hist primitive) run as a feature
    screen: which embedding dimensions carry label signal, and where
    the first tree split would cut. Companion to mi_label_dims (mutual
    information ranks dimensions; this prices the actual decision
    boundary a stump would use).

    Plan: ONE corpus pass to the (dim, bucket, label) histogram —
    dims × ~20 buckets × 10 classes ≈ 14k cells at ANY corpus size —
    then a bounded range-join split scan and per-dim argmax on the
    cell frame. Ranking compares RAW gain doubles (bit-identical
    cross-engine: every input sum is exact integer, the combination
    value-determined); output rounds at 6.
    """
    from pyspark.sql import Window

    from data_ingestion_project_spark.operators.stump import (
        histogram_cells,
        stump_split_gains,
    )

    e = table(spark, sf_dir, "embeddings")
    gains = stump_split_gains(histogram_cells(e, "embedding", "label", scale=20))
    w = Window.partitionBy("dim").orderBy(F.col("gain").desc(), F.col("b").asc())
    best = gains.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        best.orderBy(F.col("gain").desc(), F.col("dim").asc())
        .limit(10)
        .select(
            "dim",
            "threshold",
            F.col("n_left").cast("long").alias("n_left"),
            F.col("n_right").cast("long").alias("n_right"),
            floor_round(F.col("gain"), 6).alias("gini_gain"),
        )
    )


def _oracle_decision_stump_splits() -> str:
    from data_ingestion_project_spark.operators.stump import stump_sql

    return f"""
WITH {stump_sql(scale=20)},
best AS (
  SELECT * FROM (
    SELECT gains.*,
           ROW_NUMBER() OVER (PARTITION BY dim
             ORDER BY gain DESC, b ASC) AS rn
    FROM gains
  ) WHERE rn = 1
)
SELECT dim, threshold,
       CAST(n_left AS BIGINT) AS n_left,
       CAST(n_right AS BIGINT) AS n_right,
       sign(gain) * floor(abs(gain) * 1000000.0 + 0.5) / 1000000.0 AS gini_gain
FROM best
ORDER BY gain DESC, dim ASC
LIMIT 10
"""


ORACLE_DECISION_STUMP_SPLITS = _oracle_decision_stump_splits()


def simplified_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette of the embedding space
    under the SAME md5-deterministic 16-centroid assignment as
    embedding_davies_bouldin — the per-POINT quality view the DB index
    (a per-CLUSTER summary) cannot give: s = (b − a)/max(a, b) with
    a = distance to own centroid, b = distance to the nearest OTHER
    centroid, so negative-s points are sitting closer to a foreign
    cluster than their own (misassigned census). Linear-time by
    construction — the O(n²) full silhouette replaced by the
    centroid-based form every large-scale evaluator (sklearn's
    simplified variant, Spark MLlib's ClusteringEvaluator) actually
    ships.

    Plan: the one corpus pass quantizes coordinates to 1e-4 integer
    units and folds 16×64 integer (n, Σq) cells (the davies_bouldin /
    pca.py posture); per-point distances to all 16 centroids then need
    NO join-explosion — a broadcast of 16 centroid rows (Σq packed as
    a dim-ordered array) and one zip_with/aggregate expression per
    (point, centroid) pair computes the EXACT cross-multiplied integer
    numerator Σ_d (q_d·n_j − Σq_{j,d})², so dist = √num/(n_j·Q) is a
    value-determined double. Per-point silhouettes re-quantize to 1e-9
    integers before the per-cluster fold (no order-dependent double
    accumulation). n×16 intermediate rows, one groupBy per point, a
    16-row final frame.

    Exactness: decimal(38,0) squares (q·n wraps int64 past ~3e5-member
    clusters); min/max over 16 value-determined doubles is exact; the
    max(a,b)=0 degenerate (a point equal to both centroids) maps to
    s=0 identically in both engines."""
    from pyspark.sql import Window

    e = table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != QUERY_VEC_ID).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    cents = (
        corpus.withColumn("__h", F.md5(F.col("vec_id").cast("string")))
        .orderBy("__h", "vec_id")
        .limit(_DB_CENTS)
        .select(F.col("vec_id").alias("cent_id"), F.col("v").alias("c"))
    )
    assigned = corpus.crossJoin(F.broadcast(cents)).withColumn(
        "cos", cosine_similarity("v", "c")
    )
    wv = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("cent_id").asc()
    )
    inv = (
        assigned.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            F.col("cent_id").alias("own"),
            F.transform("v", lambda x: (x * F.lit(float(_DB_Q))).cast("long")).alias(
                "q"
            ),
        )
        .localCheckpoint(eager=True)
    )
    cells = (
        inv.select("own", F.posexplode("q").alias("dim", "qd"))
        .groupBy("own", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("qd").alias("sq"))
    )
    crows = cells.groupBy(F.col("own").alias("cent_j")).agg(
        F.max("n").alias("n_j"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "sq"))), lambda s: s["sq"]
        ).alias("sq_arr"),
    )
    _d38 = "decimal(38,0)"
    num = F.aggregate(
        F.zip_with("q", "sq_arr", lambda qd, sqd: qd * F.col("n_j") - sqd),
        F.lit(0).cast(_d38),
        lambda acc, diff: acc + diff.cast(_d38) * diff.cast(_d38),
    )
    dists = inv.crossJoin(F.broadcast(crows)).select(
        "vec_id",
        "own",
        "cent_j",
        (
            F.sqrt(num.cast("double"))
            / F.col("n_j").cast("double")
            / F.lit(float(_DB_Q))
        ).alias("dist"),
    )
    per_point = dists.groupBy("vec_id", "own").agg(
        F.max(F.when(F.col("cent_j") == F.col("own"), F.col("dist"))).alias("da"),
        F.min(F.when(F.col("cent_j") != F.col("own"), F.col("dist"))).alias("db"),
    )
    s = F.when(
        F.greatest("da", "db") > 0,
        (F.col("db") - F.col("da")) / F.greatest("da", "db"),
    ).otherwise(F.lit(0.0))
    pts = per_point.select(
        "own", (s * F.lit(1.0e9)).cast("long").alias("s_q")
    ).localCheckpoint(eager=True)
    tot = pts.agg(
        (
            F.sum(F.col("s_q").cast(_d38)).cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1.0e9)
        ).alias("g")
    )
    return (
        pts.groupBy("own")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            (
                F.sum(F.col("s_q").cast(_d38)).cast("double")
                / F.count(F.lit(1)).cast("double")
                / F.lit(1.0e9)
            ).alias("ms"),
            F.sum(F.when(F.col("s_q") < 0, 1).otherwise(0)).alias("n_neg"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("own").alias("cent_id"),
            F.col("n_members").cast("long").alias("n_members"),
            floor_round(F.col("ms"), 6).alias("mean_silhouette"),
            F.col("n_neg").cast("long").alias("n_misassigned"),
            floor_round(F.col("g"), 6).alias("global_silhouette"),
        )
        .orderBy("cent_id")
    )


ORACLE_SIMPLIFIED_SILHOUETTE = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}
), cents AS (
  SELECT vec_id AS cent_id, v AS c
  FROM corpus ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_DB_CENTS}
), assigned AS (
  SELECT vec_id, v, cent_id,
         ROW_NUMBER() OVER (PARTITION BY vec_id
           ORDER BY list_cosine_similarity(v, c) DESC, cent_id ASC) AS rn
  FROM corpus CROSS JOIN cents
), inv AS (
  SELECT vec_id, v, cent_id AS own FROM assigned WHERE rn = 1
), qpt AS (
  SELECT vec_id, own, g.dim AS dim,
         CAST(trunc(v[g.dim] * {_DB_Q}.0) AS BIGINT) AS q
  FROM inv CROSS JOIN generate_series(1, 64) g(dim)
), cells AS (
  SELECT own AS cent_j, dim, COUNT(*) AS n, SUM(q) AS sq
  FROM qpt GROUP BY 1, 2
), dists AS (
  SELECT p.vec_id, p.own, c.cent_j,
         sqrt(CAST(SUM((CAST(p.q AS HUGEINT) * c.n - c.sq)
                       * (CAST(p.q AS HUGEINT) * c.n - c.sq)) AS DOUBLE))
           / CAST(MAX(c.n) AS DOUBLE) / {_DB_Q}.0 AS dist
  FROM qpt p JOIN cells c ON c.dim = p.dim
  GROUP BY 1, 2, 3
), per_point AS (
  SELECT vec_id, own,
         MAX(CASE WHEN cent_j = own THEN dist END) AS da,
         MIN(CASE WHEN cent_j <> own THEN dist END) AS db
  FROM dists GROUP BY 1, 2
), pts AS (
  SELECT own,
         CAST(trunc(CASE WHEN greatest(da, db) > 0
                         THEN (db - da) / greatest(da, db) ELSE 0.0 END * 1e9)
              AS BIGINT) AS s_q
  FROM per_point
), tot AS (
  SELECT CAST(SUM(CAST(s_q AS HUGEINT)) AS DOUBLE) / COUNT(*) / 1e9 AS g
  FROM pts
)
SELECT own AS cent_id,
       COUNT(*) AS n_members,
       sign(CAST(SUM(CAST(s_q AS HUGEINT)) AS DOUBLE) / COUNT(*) / 1e9)
       * floor(abs(CAST(SUM(CAST(s_q AS HUGEINT)) AS DOUBLE) / COUNT(*) / 1e9)
              * 1000000.0 + 0.5) / 1000000.0 AS mean_silhouette,
       CAST(SUM(CASE WHEN s_q < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_misassigned,
       sign(tot.g) * floor(abs(tot.g) * 1000000.0 + 0.5) / 1000000.0
         AS global_silhouette
FROM pts CROSS JOIN tot
GROUP BY own, tot.g
ORDER BY cent_id
"""


def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding DRIFT between the first and second half of
    the corpus (vec_id order — the arrival proxy): cosine similarity
    and L2 distance between each label's half-A and half-B centroids.
    The embedding-space monitoring a production vector pipeline runs
    on every model/version boundary — psi_length_drift watches a
    scalar distribution; this watches the 64-d geometry, per class,
    and a label whose centroid cosine sags is the retraining trigger.

    Plan/exactness: the one corpus pass quantizes coordinates to 1e-4
    integers and folds (label, half, dim) → (n, Σq) cells (pca.py
    posture — ≤ labels×2×64 cells at any corpus size). Centroid cosine
    needs NO normalization by n or the quantizer: cos = ⟨ΣqA, ΣqB⟩ /
    (|ΣqA|·|ΣqB|) because the scalars cancel — all three inner
    products fold as exact DECIMAL(38,0) over the 64-cell frames. The
    L2 distance uses the davies_bouldin cross-multiplied exact
    numerator Σ(ΣqA·n_B − ΣqB·n_A)² / (n_A·n_B·Q). One sqrt/division
    per label, value-determined."""
    e = table(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") != QUERY_VEC_ID)
    span = corpus.agg(F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi"))
    _d38 = "decimal(38,0)"
    qcell = (
        corpus.crossJoin(F.broadcast(span))
        .select(
            "label",
            F.when(
                F.col("vec_id") * 2 <= F.col("lo") + F.col("hi"), "A"
            ).otherwise("B").alias("half"),
            F.posexplode(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("dim", "x"),
        )
        .select(
            "label",
            "half",
            "dim",
            (F.col("x") * F.lit(float(_DB_Q))).cast("long").alias("q"),
        )
    )
    cells = (
        qcell.groupBy("label", "half", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("sq"))
        .localCheckpoint(eager=True)
    )
    a = cells.filter(F.col("half") == "A").select(
        "label", "dim", F.col("n").alias("na"), F.col("sq").alias("qa")
    )
    b = cells.filter(F.col("half") == "B").select(
        "label", "dim", F.col("n").alias("nb"), F.col("sq").alias("qb")
    )
    per = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.max("na").cast("long").alias("n_a"),
            F.max("nb").cast("long").alias("n_b"),
            F.sum(F.col("qa").cast(_d38) * F.col("qb").cast(_d38)).alias("dab"),
            F.sum(F.col("qa").cast(_d38) * F.col("qa").cast(_d38)).alias("daa"),
            F.sum(F.col("qb").cast(_d38) * F.col("qb").cast(_d38)).alias("dbb"),
            F.sum(
                (
                    F.col("qa").cast(_d38) * F.col("nb").cast(_d38)
                    - F.col("qb").cast(_d38) * F.col("na").cast(_d38)
                )
                * (
                    F.col("qa").cast(_d38) * F.col("nb").cast(_d38)
                    - F.col("qb").cast(_d38) * F.col("na").cast(_d38)
                )
            ).alias("l2num"),
        )
    )
    cos = F.col("dab").cast("double") / F.sqrt(
        F.col("daa").cast("double") * F.col("dbb").cast("double")
    )
    l2 = (
        F.sqrt(F.col("l2num").cast("double"))
        / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        / F.lit(float(_DB_Q))
    )
    return per.select(
        "label",
        "n_a",
        "n_b",
        floor_round(cos, 6).alias("centroid_cosine"),
        floor_round(l2, 6).alias("centroid_l2"),
    ).orderBy("label")


ORACLE_EMBEDDING_CENTROID_DRIFT = f"""
WITH corpus AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
  WHERE vec_id <> {QUERY_VEC_ID}
), span AS (SELECT MIN(vec_id) AS lo, MAX(vec_id) AS hi FROM corpus),
qcell AS (
  SELECT label,
         CASE WHEN vec_id * 2 <= lo + hi THEN 'A' ELSE 'B' END AS half,
         g.dim AS dim,
         CAST(trunc(v[g.dim] * {_DB_Q}.0) AS BIGINT) AS q
  FROM corpus CROSS JOIN span CROSS JOIN generate_series(1, 64) g(dim)
), cells AS (
  SELECT label, half, dim, COUNT(*) AS n, SUM(q) AS sq
  FROM qcell GROUP BY 1, 2, 3
), per AS (
  SELECT a.label,
         CAST(MAX(a.n) AS BIGINT) AS n_a, CAST(MAX(b.n) AS BIGINT) AS n_b,
         SUM(CAST(a.sq AS HUGEINT) * b.sq) AS dab,
         SUM(CAST(a.sq AS HUGEINT) * a.sq) AS daa,
         SUM(CAST(b.sq AS HUGEINT) * b.sq) AS dbb,
         SUM((CAST(a.sq AS HUGEINT) * b.n - CAST(b.sq AS HUGEINT) * a.n)
             * (CAST(a.sq AS HUGEINT) * b.n - CAST(b.sq AS HUGEINT) * a.n))
           AS l2num
  FROM (SELECT * FROM cells WHERE half = 'A') a
  JOIN (SELECT * FROM cells WHERE half = 'B') b
    ON b.label = a.label AND b.dim = a.dim
  GROUP BY 1
)
SELECT label, n_a, n_b,
       sign(CAST(dab AS DOUBLE) / sqrt(CAST(daa AS DOUBLE) * CAST(dbb AS DOUBLE)))
       * floor(abs(CAST(dab AS DOUBLE)
                   / sqrt(CAST(daa AS DOUBLE) * CAST(dbb AS DOUBLE)))
              * 1000000.0 + 0.5) / 1000000.0 AS centroid_cosine,
       sign(sqrt(CAST(l2num AS DOUBLE))
            / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / {_DB_Q}.0)
       * floor(abs(sqrt(CAST(l2num AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) / {_DB_Q}.0)
              * 1000000.0 + 0.5) / 1000000.0 AS centroid_l2
FROM per
ORDER BY label
"""


_HOPKINS_M = 50  # probe count: fixed, corpus-size-independent
_LCG_A, _LCG_C, _LCG_M = 1_103_515_245, 12_345, 2_147_483_648


def hopkins_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopkins clustering-tendency statistic of the embedding corpus —
    the PRE-clustering sanity gate the cluster-quality family
    (silhouette, Davies–Bouldin) presumes away: H compares
    nearest-neighbor distances of m UNIFORM probe points (u) against m
    REAL sample points (w); H = Σu/(Σu+Σw) ≈ 0.5 says the corpus is
    spatially random (clustering it is numerology), H → 1 says real
    clusters exist.  Probes are deterministic: an integer LCG
    (glibc constants) fills the per-dimension bounding box, and the
    real sample is the m lowest md5(vec_id) — both replayed exactly by
    the oracle.

    Plan: coordinates quantize to 1e-4 integers (centroid-drift
    posture) so every squared distance is an exact integer; both NN
    sweeps are corpus × m-broadcast scans (linear, never pairwise);
    the bounding box is a 64-cell aggregate.  sqrt is IEEE
    correctly-rounded (no libm drift), truncated to 1e-6 integers
    before the fold; H is ONE double division."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") != QUERY_VEC_ID)
    corpus = e.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * F.lit(1.0e4), 0).cast("long"),
        ).alias("q"),
    ).localCheckpoint(eager=True)
    d2 = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    # real-sample NN (exclude self)
    rs = (
        corpus.orderBy(
            F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id")
        )
        .limit(_HOPKINS_M)
        .select(F.col("vec_id").alias("sid"), F.col("q").alias("sq"))
    )
    sw = (
        corpus.crossJoin(F.broadcast(rs))
        .filter(F.col("vec_id") != F.col("sid"))
        .select("sid", d2(F.col("q"), F.col("sq")).alias("dd"))
        .groupBy("sid")
        .agg(F.min("dd").alias("m2"))
        .agg(
            F.sum(
                (F.sqrt(F.col("m2").cast("double")) * F.lit(1.0e6)).cast("long")
            ).alias("s"),
        )
        .select(F.col("s").alias("sw"))
    )
    # uniform probes from the per-dim bounding box via integer LCG
    dims = (
        corpus.select(F.posexplode("q").alias("j", "v"))
        .groupBy("j")
        .agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    )
    ndim = dims.agg(F.count(F.lit(1)).alias("nd"))
    ugrid = (
        spark.range(_HOPKINS_M)
        .select(F.col("id").alias("i"))
        .crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(ndim))
        .select(
            "i",
            "j",
            (
                F.col("lo")
                + (
                    (
                        F.pmod(
                            F.lit(_LCG_A) * (F.col("i") * F.col("nd") + F.col("j"))
                            + F.lit(_LCG_C),
                            F.lit(_LCG_M),
                        )
                        * (F.col("hi") - F.col("lo"))
                    )
                    - F.pmod(
                        F.pmod(
                            F.lit(_LCG_A) * (F.col("i") * F.col("nd") + F.col("j"))
                            + F.lit(_LCG_C),
                            F.lit(_LCG_M),
                        )
                        * (F.col("hi") - F.col("lo")),
                        F.lit(_LCG_M),
                    )
                )
                / F.lit(_LCG_M)
            )
            .cast("long")
            .alias("uq"),
        )
    )
    ua = ugrid.groupBy("i").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "uq"))), lambda s: s["uq"]
        ).alias("uqa")
    )
    su = (
        corpus.crossJoin(F.broadcast(ua))
        .select("i", d2(F.col("q"), F.col("uqa")).alias("dd"))
        .groupBy("i")
        .agg(F.min("dd").alias("m2"))
        .agg(
            F.sum(
                (F.sqrt(F.col("m2").cast("double")) * F.lit(1.0e6)).cast("long")
            ).alias("s"),
        )
        .select(F.col("s").alias("su"))
    )
    n_c = corpus.agg(F.count(F.lit(1)).alias("n_corpus"))
    h = F.col("su").cast("double") / (F.col("su") + F.col("sw")).cast("double")
    return (
        su.crossJoin(F.broadcast(sw))
        .crossJoin(F.broadcast(n_c))
        .select(
            F.lit(_HOPKINS_M).cast("long").alias("m_probes"),
            F.col("n_corpus").cast("long").alias("n_corpus"),
            floor_round(h, 6).alias("hopkins_h"),
            floor_round(
                F.col("sw").cast("double")
                / F.lit(1.0e6)
                / F.lit(float(_HOPKINS_M))
                / F.lit(1.0e4),
                6,
            ).alias("mean_real_nn_dist"),
            floor_round(
                F.col("su").cast("double")
                / F.lit(1.0e6)
                / F.lit(float(_HOPKINS_M))
                / F.lit(1.0e4),
                6,
            ).alias("mean_probe_nn_dist"),
        )
    )


ORACLE_HOPKINS_STATISTIC = f"""
WITH corpus AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 10000.0, 0) AS BIGINT)) AS q
  FROM embeddings WHERE vec_id <> {QUERY_VEC_ID}
), rs AS (
  SELECT vec_id AS sid, q AS sq FROM corpus
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {_HOPKINS_M}
), wnn AS (
  SELECT sid,
         MIN(list_sum(list_transform(range(1, len(c.q) + 1),
                      k -> (c.q[k] - r.sq[k]) * (c.q[k] - r.sq[k])))) AS m2
  FROM corpus c CROSS JOIN rs r
  WHERE c.vec_id <> r.sid
  GROUP BY sid
), sw AS (
  SELECT SUM(CAST(trunc(sqrt(CAST(m2 AS DOUBLE)) * 1000000.0) AS BIGINT)) AS sw
  FROM wnn
), dims AS (
  SELECT j, MIN(v) AS lo, MAX(v) AS hi
  FROM (SELECT unnest(q) AS v, generate_subscripts(q, 1) - 1 AS j FROM corpus)
  GROUP BY j
), nd AS (SELECT COUNT(*) AS nd FROM dims),
ugrid AS (
  SELECT i, j,
         lo + ((({_LCG_A} * (i * nd.nd + j) + {_LCG_C}) % {_LCG_M})
               * (hi - lo)) // {_LCG_M} AS uq
  FROM dims
  CROSS JOIN (SELECT unnest(range({_HOPKINS_M})) AS i)
  CROSS JOIN nd
), ua AS (
  SELECT i, list(uq ORDER BY j) AS uqa FROM ugrid GROUP BY i
), unn AS (
  SELECT i,
         MIN(list_sum(list_transform(range(1, len(c.q) + 1),
                      k -> (c.q[k] - u.uqa[k]) * (c.q[k] - u.uqa[k])))) AS m2
  FROM corpus c CROSS JOIN ua u
  GROUP BY i
), su AS (
  SELECT SUM(CAST(trunc(sqrt(CAST(m2 AS DOUBLE)) * 1000000.0) AS BIGINT)) AS su
  FROM unn
), nc AS (SELECT COUNT(*) AS n_corpus FROM corpus)
SELECT CAST({_HOPKINS_M} AS BIGINT) AS m_probes,
       CAST(n_corpus AS BIGINT) AS n_corpus,
       sign(CAST(su AS DOUBLE) / CAST(su + sw AS DOUBLE))
       * floor(abs(CAST(su AS DOUBLE) / CAST(su + sw AS DOUBLE))
               * 1000000.0 + 0.5) / 1000000.0 AS hopkins_h,
       sign(CAST(sw AS DOUBLE) / 1000000.0 / {float(_HOPKINS_M)} / 10000.0)
       * floor(abs(CAST(sw AS DOUBLE) / 1000000.0 / {float(_HOPKINS_M)} / 10000.0)
               * 1000000.0 + 0.5) / 1000000.0 AS mean_real_nn_dist,
       sign(CAST(su AS DOUBLE) / 1000000.0 / {float(_HOPKINS_M)} / 10000.0)
       * floor(abs(CAST(su AS DOUBLE) / 1000000.0 / {float(_HOPKINS_M)} / 10000.0)
               * 1000000.0 + 0.5) / 1000000.0 AS mean_probe_nn_dist
FROM su CROSS JOIN sw CROSS JOIN nc
"""


def int8_quantization_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension audit of symmetric int8 scalar quantization of the
    embedding column — the 4× vector-store compression every
    large-scale ANN deployment applies first, priced dimension by
    dimension BEFORE committing the index build: scale (original units
    per int8 step), RMSE and max absolute reconstruction error per
    dimension expose the dims whose dynamic range makes linear int8
    lossy (the signal that says "use PQ on these, int8 on the rest").

    Semantics (all integer-exact): values quantize on the proven
    covariance grid xq = round(x·10⁴); per dim the symmetric scale is
    s = max(|min|,|max|) on that grid; the int8 code is round-half-up
    q = floor((254·xq + s)/(2s)) ∈ [−127, 127] by construction; the
    reconstruction error e = 127·xq − q·s is an exact integer in
    (127·10⁻⁴)-units, folded as Σe² in decimal — so RMSE and max-err
    are single mirrored double expressions of exact integers.

    Scale: two explode passes (one for the 64-row min/max frame —
    broadcast back — one for the error fold), each a map-side-combined
    partial agg to ≤64 cells; no windows, no data-sized joins.  All-
    zero dimensions (s = 0) are excluded in both engines."""
    e = table(spark, sf_dir, "embeddings")
    vals = e.select(F.posexplode("embedding").alias("dim", "x")).select(
        "dim",
        F.round(F.col("x").cast("double") * F.lit(1e4), 0).cast("long").alias("xq"),
    )
    scales = (
        vals.groupBy("dim")
        .agg(F.greatest(F.abs(F.min("xq")), F.abs(F.max("xq"))).alias("s"))
        .filter(F.col("s") > 0)
    )
    j = vals.join(F.broadcast(scales), "dim")
    q = F.floor(
        (F.lit(254) * F.col("xq") + F.col("s")).cast("double")
        / (F.lit(2) * F.col("s")).cast("double")
    ).cast("long")
    err = F.col("xq") * F.lit(127) - q * F.col("s")
    agg = (
        j.select("dim", "s", err.alias("e"))
        .groupBy("dim", "s")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.col("e").cast("decimal(19,0)") * F.col("e").cast("decimal(19,0)")
            ).alias("sse"),
            F.max(F.abs(F.col("e"))).alias("maxe"),
        )
    )
    u = F.lit(127.0 * 1e4)  # integer-error units per original unit
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        F.col("n").cast("long").alias("n"),
        floor_round(F.col("s").cast("double") / u, 8).alias("scale"),
        floor_round(F.sqrt(F.col("sse").cast("double") / F.col("n").cast("double")) / u, 8).alias(
            "rmse"
        ),
        floor_round(F.col("maxe").cast("double") / u, 8).alias("max_abs_err"),
    ).orderBy("dim")


ORACLE_INT8_QUANTIZATION_AUDIT = """
WITH vals AS (
  SELECT i AS dim,
         CAST(round(CAST(embedding[i + 1] AS DOUBLE) * 10000) AS BIGINT) AS xq
  FROM embeddings, range(64) r(i)
), scales AS (
  SELECT dim, GREATEST(abs(MIN(xq)), abs(MAX(xq))) AS s
  FROM vals GROUP BY dim HAVING GREATEST(abs(MIN(xq)), abs(MAX(xq))) > 0
), j AS (
  SELECT v.dim, sc.s, v.xq,
         127 * v.xq
           - CAST(floor(CAST(254 * v.xq + sc.s AS DOUBLE)
                        / CAST(2 * sc.s AS DOUBLE)) AS BIGINT) * sc.s AS e
  FROM vals v JOIN scales sc ON sc.dim = v.dim
), agg AS (
  SELECT dim, s, COUNT(*) AS n,
         SUM(CAST(e AS HUGEINT) * CAST(e AS HUGEINT)) AS sse,
         MAX(abs(e)) AS maxe
  FROM j GROUP BY dim, s
)
SELECT CAST(dim AS INTEGER) AS dim, CAST(n AS BIGINT) AS n,
       sign(CAST(s AS DOUBLE) / 1270000.0)
         * floor(abs(CAST(s AS DOUBLE) / 1270000.0) * 100000000.0 + 0.5)
         / 100000000.0 AS scale,
       sign(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)) / 1270000.0)
         * floor(abs(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)) / 1270000.0)
                 * 100000000.0 + 0.5) / 100000000.0 AS rmse,
       sign(CAST(maxe AS DOUBLE) / 1270000.0)
         * floor(abs(CAST(maxe AS DOUBLE) / 1270000.0) * 100000000.0 + 0.5)
         / 100000000.0 AS max_abs_err
FROM agg
ORDER BY dim
"""


QUERIES = {
    "hopkins_statistic": hopkins_statistic,
    "embedding_centroid_drift": embedding_centroid_drift,
    "simplified_silhouette": simplified_silhouette,
    "decision_stump_splits": decision_stump_splits,
    "embedding_davies_bouldin": embedding_davies_bouldin,
    "knn_brute_force": knn_brute_force,
    "batch_knn_search": batch_knn_search,
    "matryoshka_overlap": matryoshka_overlap,
    "top_similar_pairs": top_similar_pairs,
    "modality_dedup_agreement": modality_dedup_agreement,
    "modality_agreement_scale": modality_agreement_scale,
    "label_vector_stats": label_vector_stats,
    "embedding_cluster_stats": embedding_cluster_stats,
    "knn_lsh_approx": knn_lsh_approx,
    "lsh_recall": lsh_recall,
    "knn_ivf_approx": knn_ivf_approx,
    "ivf_recall": ivf_recall,
    "knn_ivf_disk": knn_ivf_disk,
    "semdedup_summary": semdedup_summary,
    "knn_pq_approx": knn_pq_approx,
    "pq_recall": pq_recall,
    "embedding_covariance_stats": embedding_covariance_stats,
    "pca_variance_audit": pca_variance_audit,
    "int8_quantization_audit": int8_quantization_audit,
}

ORACLE = {
    "hopkins_statistic": ORACLE_HOPKINS_STATISTIC,
    # exact-recall certification of the cluster-bounded SemDeDup (r10)
    "semdedup_summary": ORACLE_SEMDEDUP_SUMMARY,
    "embedding_centroid_drift": ORACLE_EMBEDDING_CENTROID_DRIFT,
    "simplified_silhouette": ORACLE_SIMPLIFIED_SILHOUETTE,
    "decision_stump_splits": ORACLE_DECISION_STUMP_SPLITS,
    "embedding_davies_bouldin": ORACLE_EMBEDDING_DAVIES_BOULDIN,
    "knn_brute_force": ORACLE_KNN_BRUTE_FORCE,
    "batch_knn_search": ORACLE_BATCH_KNN_SEARCH,
    "matryoshka_overlap": ORACLE_MATRYOSHKA_OVERLAP,
    "top_similar_pairs": ORACLE_TOP_SIMILAR_PAIRS,
    "modality_dedup_agreement": ORACLE_MODALITY_DEDUP_AGREEMENT,
    "label_vector_stats": ORACLE_LABEL_VECTOR_STATS,
    # full SQL replay of the md5-deterministic IVF (r5): centroid
    # choice, assignment, probe, rescore, and recall arithmetic
    "ivf_recall": ORACLE_IVF_RECALL,
    "pq_recall": ORACLE_PQ_RECALL,
    "lsh_recall": ORACLE_LSH_RECALL,
    "embedding_covariance_stats": ORACLE_EMBEDDING_COVARIANCE_STATS,
    "int8_quantization_audit": ORACLE_INT8_QUANTIZATION_AUDIT,
    # knn_lsh_approx, pca_variance_audit: rows-only by design
}
