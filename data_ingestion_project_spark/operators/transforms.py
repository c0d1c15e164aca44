"""The secure-user transform: nested API payload → 12-column secure table.

Re-expresses the reference's transform_users
(transformations.py:20-78 in /root/reference) as one declarative
select over the nested struct — flatten (P1) + projection (P2) +
derived security columns (P3-P5) + plaintext drop (P6) collapse into
a single projection, so Catalyst pipelines everything into one
codegen'd stage with the three pandas-UDF calls as its only Python
work. Output column list/order matches SURVEY.md §1.4 exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_ingestion_project_spark.functions.crypto import (
    CryptoKeys,
    make_blind_index_udf,
    make_encrypt_udf,
    make_password_hash_udf,
)


def _required(field: str) -> F.Column:
    """Fail-fast null gate, fused into the projection itself so Catalyst
    cannot prune it: the reference raises KeyError on a missing payload
    field (transformations.py:29-43); without this, a null reaching a
    crypto UDF surfaces as an opaque executor traceback instead of a
    named error."""
    return F.when(
        F.col(field).isNull(),
        F.raise_error(F.lit(f"ingestion payload missing required field: {field}")).cast("string"),
    ).otherwise(F.col(field))


def transform_users(df_raw: DataFrame, keys: CryptoKeys) -> DataFrame:
    """Nested users (RAW_USER_SCHEMA) → secure flat table (SECURE_COLUMNS).

    Invariant (SURVEY.md §1.4): plaintext password/email/phone/street
    never appear in the output; email remains equality-searchable via
    the deterministic HMAC blind index.
    """
    hash_udf = make_password_hash_udf(keys)
    enc_udf = make_encrypt_udf(keys)
    bidx_udf = make_blind_index_udf(keys)

    return df_raw.select(
        _required("login.uuid").alias("login.uuid"),  # the upsert key must never be null
        F.col("name.first").alias("name.first"),
        F.col("name.last").alias("name.last"),
        F.col("dob.date").alias("dob.date"),
        F.col("dob.age").alias("dob.age"),
        F.col("location.country").alias("location.country"),
        F.col("login.username").alias("login.username"),
        hash_udf(_required("login.password")).alias("password_hash"),
        enc_udf(_required("email")).alias("email_enc"),
        enc_udf(_required("phone")).alias("phone_enc"),
        enc_udf(_required("location.street.name")).alias("street_name_enc"),
        # normalize natively (E1: lower(trim)) before the keyed digest —
        # the UDF normalizes too (defense in depth), both are idempotent
        bidx_udf(F.lower(F.trim(_required("email")))).alias("email_bidx"),
    )
