"""Unicode hygiene for text corpora: zero-width scrub + NFC canon.

Web-scraped training text arrives with invisible format characters
(zero-width spaces/joiners, BOMs pasted mid-document) and mixed
composition forms (``e`` + COMBINING ACUTE vs precomposed ``é``) —
both inflate dedup misses (byte-different, render-identical docs) and
token counts.  The standard pipeline step is scrub-then-NFC.

Split by execution tier, per the repo's UDF policy:

- **zero-width scrub** is a character-class ``regexp_replace`` — pure
  JVM, whole-stage codegen, no Python in the path;
- **NFC normalization** has no Spark builtin (the JVM's
  ``java.text.Normalizer`` is not exposed as a SQL function), so it
  rides the sanctioned slow path: ONE Arrow-batched pandas UDF over
  ``unicodedata.normalize`` — vectorized batch transfer, never
  row-at-a-time.

Reference parity note: the reference ETL (418-line pandas job) has no
text hygiene at all; this module exists for the LLM-data-pipeline
surface (BASELINE.json north star).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Invisible format characters with no text content: ZERO WIDTH SPACE,
# ZERO WIDTH NON-JOINER, ZERO WIDTH JOINER, BYTE ORDER MARK.  All BMP,
# so JVM (UTF-16 code units) and DuckDB (code points) length() agree.
ZERO_WIDTH_CLASS = "[\u200b\u200c\u200d\ufeff]"


def scrub_zero_width(col: Column | str) -> Column:
    """Drop zero-width format characters (JVM ``regexp_replace``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, ZERO_WIDTH_CLASS, "")


@pandas_udf(StringType())
def nfc_normalize(s: pd.Series) -> pd.Series:
    """NFC-normalize a string column (Arrow-batched pandas UDF)."""
    return s.map(lambda x: None if x is None else unicodedata.normalize("NFC", x))
