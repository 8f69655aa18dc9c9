"""Deterministic cross-engine hashing.

Two families live here:

1. Knuth multiplicative shuffle keys (training-order ops) — below.
2. ``md5_long``: a 60-bit string hash computed bit-identically by Spark,
   DuckDB, and pure Python — the key that lets the sketch family
   (minhash/LSH, simhash, doc fingerprints, ANN hyperplanes) carry full
   driver value oracles instead of rows-only checks. xxhash64 is
   JVM-only; Rabin–Karp char folds are cross-engine but interpreted
   (higher-order Columns are CodegenFallback). MD5 is the standard
   primitive all three engines share natively:

   - Spark:  ``conv(substring(md5(s), 1, 15), 16, 10)`` — StaticInvoke
     into commons-codec inside whole-stage codegen;
   - DuckDB: ``CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)``;
   - Python: ``int(hashlib.md5(b).hexdigest()[:15], 16)``.

   15 hex chars = 60 bits keeps every value strictly below 2^63, so
   signed-BIGINT semantics can never diverge (no sign bit, no overflow).
   MD5 is a deterministic mixer here, not a security primitive — the
   same role FNV/xxhash play in production dedup pipelines.

Knuth multiplicative shuffle keys — the original family:

Knuth multiplicative hash mod 2^32 (key = doc_id * 2654435761 mod 2^32) —
a bijection of [0, 2^32), so keys stay unique for doc_id < 2^32 and the
"shuffled" order is a permutation, not a sample.

The naive ``doc_id * 2654435761`` overflows signed 64-bit for
doc_id > ~3.47e9: Spark silently wraps (negative keys) while DuckDB raises
a bigint-overflow error, so engine and oracle diverge exactly where the
wraparound starts.  Both helpers below split the multiply into 16-bit
halves so every intermediate stays below 2^48 — exact for ALL 64-bit
doc_ids on both engines, and bit-identical to the naive form wherever the
naive form doesn't overflow:

    k   = doc_id mod 2^32
    key = ((k_lo * A) + ((k_hi * A) mod 2^16) * 2^16) mod 2^32
          where k = k_hi * 2^16 + k_lo

Precondition: doc_id >= 0 (the Spark side uses pmod so negatives stay in
range; the SQL twin uses plain ``%``, which differs for negatives — every
driver table's ids are non-negative).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

KNUTH_A = 2654435761
_M32 = 4294967296  # 2^32
_M16 = 65536  # 2^16

__all__ = [
    "KNUTH_A",
    "knuth_shuffle_key",
    "knuth_shuffle_key_sql",
    "HASH_BITS",
    "md5_long",
    "md5_long_duck",
    "md5_long_py",
]

HASH_BITS = 60


def md5_long(col: Column | str) -> Column:
    """Spark: 60-bit integer hash of a string column (codegen-side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_duck(expr: str) -> str:
    """DuckDB SQL fragment computing the same 60-bit hash of ``expr``."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def md5_long_py(s: str) -> int:
    """Pure-Python twin (for property/value oracles in tests)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def knuth_shuffle_key(doc_id: Column) -> Column:
    """``(doc_id * 2654435761) mod 2^32`` without 64-bit overflow."""
    k = F.pmod(doc_id.cast("long"), F.lit(_M32))
    k_lo = k % F.lit(_M16)
    k_hi = F.floor(k / F.lit(_M16))  # k < 2^32 < 2^53: double div exact
    return (
        k_lo * F.lit(KNUTH_A) + ((k_hi * F.lit(KNUTH_A)) % F.lit(_M16)) * F.lit(_M16)
    ) % F.lit(_M32)


def knuth_shuffle_key_sql(expr: str) -> str:
    """DuckDB twin of :func:`knuth_shuffle_key` (``//`` = integer div)."""
    k = f"(({expr}) % {_M32})"
    return (
        f"(({k} % {_M16}) * {KNUTH_A}"
        f" + ((({k} // {_M16}) * {KNUTH_A}) % {_M16}) * {_M16}) % {_M32}"
    )
