"""The users source: JSON payload → DataFrame, plus the HTTP fetcher.

Mirrors the reference's HTTP JSON source (api_client.py:9-27 in
/root/reference): GET randomuser.me for ``results`` users restricted
to 7 field groups, fail-fast on HTTP errors, extract the ``results``
array. The source-side LIMIT (``results=``) and projection
(``inc=``) pushdowns are kept as request parameters (SURVEY.md §4).

Tests are fixture-driven (``users_from_json``) — no network. At scale
the fetch moves into ``mapInPandas`` over a partitioned page range so
executors fetch concurrently; the driver-side fetch here is parity
with the reference's single-batch model.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from data_ingestion_project_spark.schemas import RAW_USER_SCHEMA

RANDOMUSER_URL = "https://randomuser.me/api/"
INCLUDE_FIELDS = "login,name,email,registered,dob,location,phone"  # api_client.py:12
DEFAULT_BATCH = 10  # api_client.py:11
DEFAULT_TIMEOUT = 15  # api_client.py:15


def users_from_json(spark: SparkSession, users: list[dict[str, Any]]) -> DataFrame:
    """Payload rows → DataFrame with the pinned nested schema.

    Postcodes are coerced to string here (the one inference hazard the
    reference carries — SURVEY.md §1.2). The coercion copies the user
    and location dicts rather than mutating the caller's payload —
    callers may reuse fixtures/batches after ingestion."""
    coerced: list[dict[str, Any]] = []
    for u in users:
        loc = u.get("location")
        if loc and loc.get("postcode") is not None and not isinstance(loc["postcode"], str):
            u = dict(u)
            u["location"] = {**loc, "postcode": str(loc["postcode"])}
        coerced.append(u)
    return spark.createDataFrame(coerced, schema=RAW_USER_SCHEMA)


def fetch_random_users(
    results: int = DEFAULT_BATCH, timeout: int = DEFAULT_TIMEOUT
) -> tuple[list[dict[str, Any]], Any]:
    """Driver-side HTTP fetch with the reference's fail-fast contract
    (raise_for_status at api_client.py:22). Returns (users, response).
    """
    import requests  # local import: tests never touch the network

    url = f"{RANDOMUSER_URL}?results={results}&inc={INCLUDE_FIELDS}"
    resp = requests.get(url, timeout=timeout)
    resp.raise_for_status()
    return resp.json()["results"], resp
