"""PII-security column functions: password hashing, field encryption,
blind index — the invariant the reference exists to maintain
(crypto_utils.py in /root/reference): no plaintext secret reaches
disk; email equality search survives via a deterministic keyed digest.

Spark mapping (SURVEY.md §2 P3/P4/P5): these are the engine's only
Python UDFs, and they are Arrow-vectorized scalar pandas UDFs —
serialization is amortized per batch and the deliberately-slow
password hash parallelizes per partition, which is the entire Spark
win for this workload (crypto throughput scales with executor count).

Library substitutions (this environment):
- Password hash: Argon2id (argon2-cffi, crypto_utils.py:57,73-75) when
  importable; otherwise stdlib ``hashlib.scrypt`` — also a memory-hard
  password KDF — with cost parameters carried in the same
  config-injectable profile. Output is PHC-style ``$scrypt$...``.
- Field encryption: Fernet (cryptography), exact parity with
  crypto_utils.py:84-88.
- Blind index: stdlib ``hmac`` + SHA-256, exact parity with
  crypto_utils.py:103-104. (``F.sha2`` is unkeyed — NOT a substitute.)

Keys are injected (never read from globals inside executors); the
salted/IV'd UDFs are marked ``asNondeterministic()`` so Catalyst never
re-executes them across plan branches (ciphertexts would silently
differ — SURVEY.md §4.3).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

try:  # argon2-cffi is the reference's KDF; optional in this environment
    from argon2 import PasswordHasher  # type: ignore

    HAVE_ARGON2 = True
except ImportError:
    HAVE_ARGON2 = False

from cryptography.fernet import Fernet


@dataclass(frozen=True)
class KdfProfile:
    """Cost parameters, config-injectable (BASELINE.md crypto note).

    ``reference()`` mirrors crypto_utils.py:57 (time_cost=3,
    memory_cost=65536 KiB, parallelism=1 → ~64 MiB per hash);
    ``test()`` is a low-cost profile so correctness tests and benches
    aren't dominated by KDF work by design.
    """

    time_cost: int = 3
    memory_cost_kib: int = 65536
    parallelism: int = 1

    @classmethod
    def reference(cls) -> "KdfProfile":
        return cls()

    @classmethod
    def test(cls) -> "KdfProfile":
        return cls(time_cost=1, memory_cost_kib=1024, parallelism=1)

    # scrypt equivalents: N from memory (mem = 128 * N * r bytes, r=8)
    @property
    def scrypt_n(self) -> int:
        n = max(2, (self.memory_cost_kib * 1024) // (128 * 8))
        return 1 << (n.bit_length() - 1)  # power of two


def load_env_file(path: str | os.PathLike) -> dict[str, str]:
    """Minimal ``.env`` parser (python-dotenv subset, stdlib only —
    parity with the reference's ``load_dotenv(BASE_DIR / ".env")`` at
    crypto_utils.py:27 without adding the dependency).

    Supports ``KEY=value`` lines, ``export KEY=value``, blank lines,
    ``#`` comments, and single/double-quoted values. Returns a dict;
    callers decide precedence (from_env gives os.environ priority,
    matching load_dotenv's override=False default).
    """
    out: dict[str, str] = {}
    with open(path, encoding="utf-8") as fh:
        for raw in fh:
            line = raw.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            if line.startswith("export "):
                line = line[len("export ") :]
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip()
            if len(value) >= 2 and value[0] in "\"'":
                # quoted value: closing quote ends it; anything after
                # (e.g. an inline comment) is dropped
                closing = value.find(value[0], 1)
                if closing > 0:
                    value = value[1:closing]
                else:  # unterminated quote — keep verbatim minus the quote
                    value = value[1:]
            else:
                # python-dotenv parity: '#' starts an inline comment
                # only when PRECEDED BY WHITESPACE — a bare '#' inside
                # an unquoted secret (PEPPER=ab#cd) is part of the value
                for i, ch in enumerate(value):
                    if ch == "#" and (i == 0 or value[i - 1] in " \t"):
                        value = value[:i].rstrip()
                        break
            if key:
                out[key] = value
    return out


@dataclass(frozen=True)
class CryptoKeys:
    """Key material, injected explicitly (no env reads on executors).

    The reference loads PEPPER / FERNET_KEY / BLIND_INDEX_KEY from the
    environment at import time (crypto_utils.py:34-44); here the driver
    resolves them once and ships them to executors via UDF closure.
    """

    pepper: str
    fernet_key: bytes
    blind_index_key: bytes
    profile: KdfProfile = field(default_factory=KdfProfile.test)

    @classmethod
    def from_env(
        cls,
        profile: KdfProfile | None = None,
        env_file: str | os.PathLike | None = None,
    ) -> "CryptoKeys":
        """Resolve key material the way the reference does
        (crypto_utils.py:27-45): optionally hydrate os.environ from a
        ``.env`` file (python-dotenv posture, stdlib parse — existing
        exported vars win, matching load_dotenv's default), then read
        PEPPER as-is, FERNET_KEY as the base64 *string* bytes Fernet
        expects, and BLIND_INDEX_KEY **base64-decoded** to raw bytes
        (crypto_utils.py:45) so email_bidx digests match tables the
        reference produced with the same deployed secret.
        """
        env = dict(load_env_file(env_file)) if env_file else {}
        env.update(os.environ)  # real environment wins, like load_dotenv
        return cls(
            pepper=env["PEPPER"],
            fernet_key=env["FERNET_KEY"].encode(),
            blind_index_key=base64.b64decode(env["BLIND_INDEX_KEY"]),
            profile=profile or KdfProfile.test(),
        )

    @classmethod
    def for_tests(cls) -> "CryptoKeys":
        return cls(
            pepper="test-pepper",
            fernet_key=Fernet.generate_key(),
            blind_index_key=b"test-blind-index-key",
            profile=KdfProfile.test(),
        )


# ----------------------------------------------------------- plain fns


def hash_password(password: str, keys: CryptoKeys) -> str:
    """Memory-hard hash of password+pepper (crypto_utils.py:73-75)."""
    peppered = password + keys.pepper
    if HAVE_ARGON2:
        ph = PasswordHasher(
            time_cost=keys.profile.time_cost,
            memory_cost=keys.profile.memory_cost_kib,
            parallelism=keys.profile.parallelism,
        )
        return ph.hash(peppered)
    salt = os.urandom(16)
    n = keys.profile.scrypt_n
    dk = hashlib.scrypt(
        peppered.encode(), salt=salt, n=n, r=8, p=keys.profile.parallelism, maxmem=256 * 1024 * 1024
    )
    return (
        f"$scrypt$n={n},r=8,p={keys.profile.parallelism}$"
        f"{base64.b64encode(salt).decode()}${base64.b64encode(dk).decode()}"
    )


def verify_password(stored: str, password: str, keys: CryptoKeys) -> bool:
    """Semantic verification (FIXTURES.md §2: hashes are salted, so
    tests verify rather than compare bytes)."""
    peppered = password + keys.pepper
    if stored.startswith("$scrypt$"):
        # A corrupt stored token must fail THAT credential, not crash
        # the whole verification batch.
        try:
            _, _, params, salt_b64, dk_b64 = stored.split("$")
            kv = dict(p.split("=") for p in params.split(","))
            dk = hashlib.scrypt(
                peppered.encode(),
                salt=base64.b64decode(salt_b64),
                n=int(kv["n"]),
                r=int(kv["r"]),
                p=int(kv["p"]),
                maxmem=256 * 1024 * 1024,
            )
            return hmac.compare_digest(dk, base64.b64decode(dk_b64))
        except (ValueError, KeyError):
            return False
    if HAVE_ARGON2:
        try:
            PasswordHasher().verify(stored, peppered)
            return True
        except Exception:
            return False
    raise ValueError(f"unrecognized hash format: {stored[:16]}...")


def encrypt_str(value: str, keys: CryptoKeys) -> str:
    """Fernet encryption (crypto_utils.py:84-88): random IV + embedded
    timestamp ⇒ non-deterministic ciphertext by design."""
    return Fernet(keys.fernet_key).encrypt(value.encode()).decode()


def decrypt_str(token: str, keys: CryptoKeys) -> str:
    return Fernet(keys.fernet_key).decrypt(token.encode()).decode()


def normalize_email(value: str) -> str:
    """trim + lowercase (crypto_utils.py:97-98). Column-level twin:
    ``F.lower(F.trim(col))`` — used natively in transforms."""
    return value.strip().lower()


def blind_index(value: str, keys: CryptoKeys) -> str:
    """HMAC-SHA256(key, normalized value) → hex (crypto_utils.py:103-104).
    Deterministic ⇒ equality-searchable."""
    return hmac.new(keys.blind_index_key, normalize_email(value).encode(), hashlib.sha256).hexdigest()


# ----------------------------------------------------------- pandas UDFs


def make_password_hash_udf(keys: CryptoKeys):
    """Scalar pandas UDF for the password hash (salted ⇒ nondeterministic)."""

    @pandas_udf(StringType())
    def _hash(s: pd.Series) -> pd.Series:
        return s.map(lambda v: hash_password(v, keys))

    return _hash.asNondeterministic()


def make_encrypt_udf(keys: CryptoKeys):
    """Scalar pandas UDF for Fernet field encryption (nondeterministic).

    The Fernet object is constructed once per batch, not per row."""

    @pandas_udf(StringType())
    def _enc(s: pd.Series) -> pd.Series:
        f = Fernet(keys.fernet_key)
        return s.map(lambda v: f.encrypt(v.encode()).decode())

    return _enc.asNondeterministic()


def aes_encrypt_native(col, key: bytes):
    """JVM-native AES-GCM column encryption (``F.aes_encrypt``,
    Spark ≥3.3) — the scale path for field encryption: no Python
    round-trip at all, random IV per value (nondeterministic by
    design, like Fernet). Output base64 for string-typed storage.

    The Fernet UDF remains the reference-parity path (same token
    format as crypto_utils.py:84-88); this one trades format parity
    for whole-stage-codegen throughput. Key must be 16/24/32 bytes.

    Caveat: two *textually identical* aes_encrypt expressions in one
    projection are collapsed by common-subexpression elimination and
    yield ONE ciphertext — distinct IVs are guaranteed per evaluated
    expression/row, not per syntactic mention.
    """
    from pyspark.sql import functions as F

    if len(key) not in (16, 24, 32):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    c = F.col(col) if isinstance(col, str) else col
    return F.base64(F.aes_encrypt(c.cast("binary"), F.lit(key), F.lit("GCM")))


def aes_decrypt_native(col, key: bytes):
    from pyspark.sql import functions as F

    if len(key) not in (16, 24, 32):
        raise ValueError(f"AES key must be 16/24/32 bytes, got {len(key)}")
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(F.unbase64(c), F.lit(key), F.lit("GCM")).cast("string")


def make_blind_index_udf(keys: CryptoKeys):
    """Scalar pandas UDF for the HMAC blind index (deterministic)."""
    key = keys.blind_index_key

    @pandas_udf(StringType())
    def _bidx(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: hmac.new(key, v.strip().lower().encode(), hashlib.sha256).hexdigest()
        )

    return _bidx
