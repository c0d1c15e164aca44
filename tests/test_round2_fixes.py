"""Round-2 hardening tests (VERDICT/ADVICE items): key-encoding parity,
.env loading, malformed-hash tolerance, input immutability, as-of tie
determinism, compaction crash recovery."""

from __future__ import annotations

import base64
import copy
import os

import pytest

from data_ingestion_project_spark.functions.crypto import (
    CryptoKeys,
    KdfProfile,
    blind_index,
    hash_password,
    load_env_file,
    verify_password,
)


def test_from_env_b64_decodes_blind_index_key(monkeypatch):
    """Parity with crypto_utils.py:45: BLIND_INDEX_KEY env value is
    base64 text; the HMAC key is its DECODED bytes — same deployed
    secret must produce the same email_bidx as the reference."""
    raw = b"\x01\x02secret-key-bytes\xff"
    monkeypatch.setenv("PEPPER", "p")
    monkeypatch.setenv("FERNET_KEY", "x" * 43 + "=")
    monkeypatch.setenv("BLIND_INDEX_KEY", base64.b64encode(raw).decode())
    keys = CryptoKeys.from_env()
    assert keys.blind_index_key == raw
    # and the digest is keyed by the raw bytes, not the b64 text
    import hashlib
    import hmac as hmac_mod

    expect = hmac_mod.new(raw, b"a@b.com", hashlib.sha256).hexdigest()
    assert blind_index(" A@B.com ", keys) == expect


def test_env_file_loading_and_precedence(tmp_path, monkeypatch):
    """.env parity (reference crypto_utils.py:27 load_dotenv): file
    values hydrate missing keys; exported variables win."""
    raw = b"blind-key"
    env = tmp_path / ".env"
    env.write_text(
        "# comment\n"
        "PEPPER='file-pepper'\n"
        "export FERNET_KEY=" + "y" * 43 + "=\n"
        f"BLIND_INDEX_KEY={base64.b64encode(raw).decode()}  # inline\n"
        "\nGARBAGE-LINE-NO-EQ\n"
    )
    parsed = load_env_file(env)
    assert parsed["PEPPER"] == "file-pepper"
    assert parsed["FERNET_KEY"].startswith("y")
    for k in ("PEPPER", "FERNET_KEY", "BLIND_INDEX_KEY"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("PEPPER", "exported-wins")
    keys = CryptoKeys.from_env(env_file=env)
    assert keys.pepper == "exported-wins"
    assert keys.blind_index_key == raw


def test_verify_password_malformed_token_returns_false(keys):
    """One corrupt stored hash fails that credential, not the batch."""
    good = hash_password("pw", keys)
    assert verify_password(good, "pw", keys)
    for bad in (
        "$scrypt$not-params$x$y",  # params not k=v
        "$scrypt$n=abc,r=8,p=1$c2FsdA==$ZGs=",  # non-int cost
        "$scrypt$n=16$c2FsdA==$ZGs=",  # missing keys
        "$scrypt$broken",  # wrong field count
        "$scrypt$n=16,r=8,p=1$!!notb64!!$ZGs=",  # bad base64
    ):
        assert verify_password(bad, "pw", keys) is False


def test_users_from_json_does_not_mutate_payload(spark, batch1):
    from data_ingestion_project_spark.sources.users_json import users_from_json

    before = copy.deepcopy(batch1)
    users_from_json(spark, batch1)
    assert batch1 == before  # int postcodes still int in caller's dicts


def test_asof_tie_on_equal_timestamp_is_deterministic(spark):
    """Two right rows with identical (key, ts): the greatest payload
    wins, regardless of input order or partitioning (ADVICE asof.py:79)."""
    from data_ingestion_project_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 100)], "id string, ts long")
    rights = [("k", 100, "aaa"), ("k", 100, "zzz"), ("k", 50, "early")]
    for perm in (rights, rights[::-1], [rights[1], rights[0], rights[2]]):
        for nparts in (1, 3):
            right = spark.createDataFrame(perm, "id string, ts long, v string").repartition(nparts)
            out = asof_join(left, right, on=["id"], left_ts="ts", right_ts="ts").collect()
            assert len(out) == 1 and out[0]["v_asof"] == "zzz"
    # explicit tiebreak column: same answer via named field
    right = spark.createDataFrame(rights, "id string, ts long, v string")
    out = asof_join(
        left, right, on=["id"], left_ts="ts", right_ts="ts", right_tiebreak="v"
    ).collect()
    assert out[0]["v_asof"] == "zzz"


def test_compaction_survives_crash_leftovers(spark, tmp_path):
    """A leftover scratch dir from a crashed run must not block the next
    compaction (ADVICE layout.py:87)."""
    from data_ingestion_project_spark.operators.layout import compact_parquet

    path = str(tmp_path / "t")
    spark.range(1000).write.parquet(path)
    os.makedirs(path + "__compact_old", exist_ok=True)  # stale fixed-name leftover
    os.makedirs(path + "__compact_tmp", exist_ok=True)
    compact_parquet(spark, path, target_file_mb=1)
    assert spark.read.parquet(path).count() == 1000
