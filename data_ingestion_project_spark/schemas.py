"""Explicit schemas for the ingestion pipeline.

The reference never declares a schema — everything is inferred twice
(pd.json_normalize at transformations.py:25, pd.read_csv at
io_utils.py:24 in /root/reference), which makes column types payload-
dependent (postcode arrives int or string by nationality). Here the
two table shapes are pinned once; every read/createDataFrame goes
through them (SURVEY.md §1.2/§1.3 decision).
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# Nested API payload restricted to the 7 field groups the reference
# requests (inc=login,name,email,registered,dob,location,phone —
# api_client.py:12). See FIXTURES.md §1.
RAW_USER_SCHEMA = StructType(
    [
        StructField(
            "name",
            StructType(
                [
                    StructField("title", StringType()),
                    StructField("first", StringType()),
                    StructField("last", StringType()),
                ]
            ),
        ),
        StructField(
            "location",
            StructType(
                [
                    StructField(
                        "street",
                        StructType(
                            [
                                StructField("number", IntegerType()),
                                StructField("name", StringType()),
                            ]
                        ),
                    ),
                    StructField("city", StringType()),
                    StructField("state", StringType()),
                    StructField("country", StringType()),
                    # int OR string in the wild API → pinned as string
                    StructField("postcode", StringType()),
                    StructField(
                        "coordinates",
                        StructType(
                            [
                                StructField("latitude", StringType()),
                                StructField("longitude", StringType()),
                            ]
                        ),
                    ),
                    StructField(
                        "timezone",
                        StructType(
                            [
                                StructField("offset", StringType()),
                                StructField("description", StringType()),
                            ]
                        ),
                    ),
                ]
            ),
        ),
        StructField("email", StringType()),
        StructField(
            "login",
            StructType(
                [
                    StructField("uuid", StringType()),
                    StructField("username", StringType()),
                    StructField("password", StringType()),
                    StructField("salt", StringType()),
                    StructField("md5", StringType()),
                    StructField("sha1", StringType()),
                    StructField("sha256", StringType()),
                ]
            ),
        ),
        StructField(
            "dob",
            StructType(
                [
                    # ISO-8601 string; never parsed to timestamp in the
                    # reference (SURVEY.md §1.2) — kept string for parity
                    StructField("date", StringType()),
                    StructField("age", IntegerType()),
                ]
            ),
        ),
        StructField(
            "registered",
            StructType(
                [
                    StructField("date", StringType()),
                    StructField("age", IntegerType()),
                ]
            ),
        ),
        StructField("phone", StringType()),
    ]
)

# The persistent secure table (transformations.py:29-75 + io_utils.py:37
# in /root/reference). Dotted names are literal flat column names; order
# matters for CSV byte parity. See FIXTURES.md §2.
SECURE_COLUMNS = (
    "login.uuid",
    "name.first",
    "name.last",
    "dob.date",
    "dob.age",
    "location.country",
    "login.username",
    "password_hash",
    "email_enc",
    "phone_enc",
    "street_name_enc",
    "email_bidx",
)

SECURE_USER_SCHEMA = StructType(
    [
        StructField(name, IntegerType() if name == "dob.age" else StringType())
        for name in SECURE_COLUMNS
    ]
)
