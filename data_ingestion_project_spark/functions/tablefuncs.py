"""Python UDTFs — the user-defined TABLE function surface.

The engine's design rule is JVM-first: set-returning transformations
are expressed with ``explode``/``posexplode``/``inline`` over codegen
expressions wherever possible (see functions/text.py — shingling,
winnowing, and token splits are all built that way, and the reference
has no UDTF concept at all). A Python UDTF is the escape hatch for
row→table logic that genuinely needs Python (an external parser or
model); this module keeps one real example so the surface is covered,
tested, and its cost documented: a UDTF runs row-at-a-time in the
Python worker — Arrow moves the data, but the function body is not
vectorized, so keep it OFF fact-table hot paths.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, sentence string, n_chars int")
class SentenceSplit:
    """Split a document into trimmed, non-empty '.'-terminated
    sentences with their position — the row→table shape (LATERAL-able
    from SQL). Deterministic, so results are engine-comparable."""

    def eval(self, text: str):  # noqa: D102 — contract defined by Spark
        if text is None:
            return
        for pos, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield pos, s, len(s)


def register_udtfs(spark) -> None:
    """Register all UDTFs for SQL use (idempotent)."""
    spark.udtf.register("sentence_split", SentenceSplit)
