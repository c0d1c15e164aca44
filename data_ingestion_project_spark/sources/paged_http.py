"""Executor-side paged fetch: the 100 TB-scale form of the users source.

The reference fetches one 10-row batch on the driver
(api_client.py:9-27 in /root/reference). That shape cannot scale —
the driver becomes the bottleneck and the single point of retry. The
scale form distributes a *page range* and fetches inside
``mapInPandas``: each executor task owns a slice of pages, performs
its own fail-fast HTTP calls, and emits rows as Arrow batches. The
driver never sees payload data.

The fetcher is injectable (``page -> list[user dict]``) so tests run
networkless with a deterministic fake; production passes a
requests-based fetcher with the same contract. Per-task fetch also
localizes retries: one bad page fails one task (and Spark retries
that task), not the whole job.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from data_ingestion_project_spark.schemas import RAW_USER_SCHEMA

Fetcher = Callable[[int, int], list[dict[str, Any]]]  # (page, page_size) -> users


def http_fetcher(page: int, page_size: int) -> list[dict[str, Any]]:
    """Production fetcher: randomuser.me supports seeded paging, which
    makes page contents deterministic per (seed, page) — the property
    that lets a retried task re-fetch identical rows."""
    import requests

    from data_ingestion_project_spark.sources.users_json import INCLUDE_FIELDS, RANDOMUSER_URL

    url = (
        f"{RANDOMUSER_URL}?results={page_size}&page={page}"
        f"&seed=spark-graft&inc={INCLUDE_FIELDS}"
    )
    resp = requests.get(url, timeout=15)
    resp.raise_for_status()  # fail-fast parity (api_client.py:22)
    return resp.json()["results"]


def offline_fetcher(page: int, page_size: int) -> list[dict[str, Any]]:
    """Deterministic networkless fetcher (same contract as
    ``http_fetcher``): page contents are a pure function of
    (page, page_size), which is exactly the retry-safety property the
    production fetcher gets from seeded paging. Used as the documented
    offline mode and as the importable fetcher for the Python
    DataSource tests (DataSource options carry a dotted path, not a
    callable)."""
    return [
        {
            "name": {"title": "Mr", "first": f"F{page}-{i}", "last": "L"},
            "location": {
                "street": {"number": i, "name": f"S{i}"},
                "city": "C",
                "state": "S",
                "country": "Nowhere",
                "postcode": 1000 + i,  # int on purpose: readers must pin to string
                "coordinates": {"latitude": "0", "longitude": "0"},
                "timezone": {"offset": "+0:00", "description": "UTC"},
            },
            "email": f"p{page}u{i}@x.com",
            "login": {
                "uuid": f"p{page}-u{i}",
                "username": f"user{page}_{i}",
                "password": f"pw{page}_{i}",
                "salt": "s",
                "md5": "m",
                "sha1": "h",
                "sha256": "h",
            },
            "dob": {"date": "1980-01-01T00:00:00Z", "age": 40},
            "registered": {"date": "2010-01-01T00:00:00Z", "age": 10},
            "phone": "555",
        }
        for i in range(page_size)
    ]


def fetch_user_pages(
    spark: SparkSession,
    n_pages: int,
    page_size: int = 10,
    fetcher: Fetcher = http_fetcher,
    tasks: int | None = None,
) -> DataFrame:
    """Distributed fetch of ``n_pages`` pages → users DataFrame.

    The page range is a tiny driver-side DataFrame repartitioned to
    ``tasks``; all payload I/O happens in the mapInPandas stage."""
    tasks = tasks or min(n_pages, spark.sparkContext.defaultParallelism)
    pages = spark.range(1, n_pages + 1).toDF("page").repartition(tasks)

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for page in pdf["page"]:
                for u in fetcher(int(page), page_size):
                    loc = u.get("location") or {}
                    if loc.get("postcode") is not None:
                        # copy before coercing the unstable type — never
                        # mutate the fetcher's dicts (shared fixtures)
                        u = {**u, "location": {**loc, "postcode": str(loc["postcode"])}}
                    rows.append(u)
            yield pd.DataFrame(
                {name: [r.get(name) for r in rows] for name in RAW_USER_SCHEMA.fieldNames()}
            )

    return pages.mapInPandas(_fetch, schema=RAW_USER_SCHEMA)
