"""Engine-portable deterministic hashing.

One definition for the md5-prefix bucket hash used anywhere an
assignment must be reproducible across engines AND across repo
call sites (DSIR feature buckets, training-shard planning, the shard
EXPORT layout): first 6 md5 hex chars as an integer, mod buckets.
Write-path and read-path consumers importing the same expression is
load-bearing — a drifted copy would silently desynchronize written
shard layouts from the plan/oracle accounting.

SQL mirror (DuckDB): CAST(concat('0x', substr(md5(x),1,6)) AS BIGINT) % n
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_bucket(col: Column | str, buckets: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 6), 16, 10).cast("long") % buckets
