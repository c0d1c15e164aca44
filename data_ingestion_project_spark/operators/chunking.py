"""Sliding-window document chunking — the training/RAG preparation
step that cuts long documents into overlapping token windows (stride <
window ⇒ consecutive chunks share window-stride tokens of context, the
standard recipe for LM pretraining shards and retrieval corpora).

Pure JVM expressions end to end: tokenize once, explode the stride
grid (``sequence``), slice each window (``slice``) — no UDF, no
shuffle at all until the caller aggregates (chunking is embarrassingly
row-local, and the plan shows exactly that: scan → project/explode).
Contrast with queries/documents.sequence_packing, which CONCATENATES
short docs up to a budget; chunking SPLITS long docs down to one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """One row per chunk: (id, chunk_idx, n_tokens, chunk_text).

    Chunk i covers tokens [i*stride, i*stride + window); the last chunk
    is the first one whose start reaches the document's end, so every
    token lands in ≥1 chunk and trailing fragments are kept (dropping
    them silently biases the corpus against document endings). Empty
    documents yield no chunks."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got stride={stride}, window={window}")
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(F.filter(toks, lambda t: t != ""))
    toks = F.filter(toks, lambda t: t != "")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
    ).filter(F.col("__n") > 0)
    # starts: 0, stride, 2*stride, ... up to the last start < n
    starts = F.sequence(
        F.lit(0),
        ((F.col("__n") - 1) / F.lit(stride)).cast("int") * F.lit(stride),
        F.lit(stride),
    )
    chunks = base.select(
        id_col,
        F.posexplode(starts).alias("chunk_idx", "__start"),
        F.col("__toks"),
    ).select(
        id_col,
        "chunk_idx",
        F.slice(F.col("__toks"), F.col("__start") + 1, window).alias("__chunk"),
    )
    return chunks.select(
        id_col,
        "chunk_idx",
        F.size("__chunk").alias("n_tokens"),
        F.array_join("__chunk", " ").alias("chunk_text"),
    )
