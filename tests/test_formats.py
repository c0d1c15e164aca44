"""Round-trip every supported format with the secure users table."""

from __future__ import annotations

import pytest

from data_ingestion_project_spark.operators.transforms import transform_users
from data_ingestion_project_spark.schemas import SECURE_USER_SCHEMA
from data_ingestion_project_spark.sources.formats import read_table, write_table
from data_ingestion_project_spark.sources.users_json import users_from_json


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_secure_table_roundtrip(spark, keys, tmp_path, batch1, fmt):
    out = transform_users(users_from_json(spark, batch1), keys)
    path = str(tmp_path / f"users_{fmt}")
    write_table(out, path, fmt=fmt)
    back = read_table(spark, path, fmt=fmt, schema=SECURE_USER_SCHEMA)
    assert back.count() == 10
    orig = {r["login.uuid"]: r["email_bidx"] for r in out.collect()}
    got = {r["login.uuid"]: r["email_bidx"] for r in back.collect()}
    assert got == orig  # deterministic column survives every format


def test_text_formats_require_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="schema-on-read"):
        read_table(spark, str(tmp_path), fmt="json")


def test_unknown_format_rejected(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        write_table(spark.range(1), "/tmp/x", fmt="avro")


def test_jsonl_quarantine_routes_bad_rows_not_fails(spark, tmp_path):
    """read_quarantined: a malformed line lands whole in
    _corrupt_record with data columns NULL; clean rows parse normally;
    the FAILFAST twin raises on the same file."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from data_ingestion_project_spark.sources.formats import read_quarantined

    p = tmp_path / "feed.jsonl"
    p.write_text('{"id": 1, "name": "a"}\n{"id": "NOT_A_NUMBER", "name": "b"}\n')
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])

    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        read_table(spark, str(p), fmt="json", schema=schema).collect()

    rows = read_quarantined(spark, str(p), "json", schema).collect()
    ok = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert [(r["id"], r["name"]) for r in ok] == [(1, "a")]
    assert len(bad) == 1 and "NOT_A_NUMBER" in bad[0]["_corrupt_record"]
    assert bad[0]["id"] is None  # quarantined whole, not half-parsed

    with pytest.raises(ValueError, match="schema-on-read"):
        read_quarantined(spark, str(p), "parquet", schema)
