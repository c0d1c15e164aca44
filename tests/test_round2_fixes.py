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


def test_connected_components_rejects_string_dst(spark):
    """Both edge endpoints must be integral — a string dst would coerce
    the symmetric union to string and silently break the sum-based
    convergence check."""
    import pytest

    from data_ingestion_project_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, "doc_2")], "src long, dst string")
    with pytest.raises(ValueError, match="integral node ids"):
        connected_components(edges)


def test_substitution_pairs_respect_length_on_empty_strings(spark):
    """'' and 'x' share (i=1, prefix='', suffix='') — the length in the
    variant key must keep this unequal-length pair out, while equal
    empty strings still pair (distance 0)."""
    from data_ingestion_project_spark.operators.dedup import substitution_block_pairs

    df = spark.createDataFrame(
        [(1, ""), (2, "x"), (3, ""), (4, "y")], "id long, t string"
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in substitution_block_pairs(df, id_col="id", text_col="t").collect()
    }
    assert (1, 3) in pairs          # equal-length (empty) pair kept
    assert (1, 2) not in pairs      # '' vs 'x': unequal length, excluded
    assert (2, 4) in pairs          # 'x' vs 'y': substitution distance 1


def test_env_file_hash_inside_unquoted_value(tmp_path):
    """python-dotenv parity: '#' is a comment only after whitespace."""
    from data_ingestion_project_spark.functions.crypto import load_env_file

    p = tmp_path / ".env"
    p.write_text("PEPPER=ab#cd\nKEY=v1 # real comment\n")
    env = load_env_file(str(p))
    assert env["PEPPER"] == "ab#cd"
    assert env["KEY"] == "v1"


def test_ivf_assign_tolerates_null_embeddings(spark):
    from data_ingestion_project_spark.operators.similarity import ivf_assign

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = ivf_assign(df, [[1.0, 0.0], [0.0, 1.0]])
    rows = {r["vec_id"]: r["list_id"] for r in out.collect()}
    assert rows == {1: 0, 3: 1}  # null row dropped, no crash


def test_winnow_null_text_emits_no_fingerprints(spark):
    from data_ingestion_project_spark.functions.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "a real document body here")],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, "text", "doc_id", k=8, w=4)
    ids = {r["doc_id"] for r in fps.collect()}
    assert ids == {3}  # null-text docs share NO fake fingerprint
