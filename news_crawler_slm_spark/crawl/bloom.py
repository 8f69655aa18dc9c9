"""Partitioned Bloom filter (+ cuckoo fallback) for the URL-seen set.

North-rule component: "a partitioned Bloom-filter (with cuckoo-filter
fallback) URL-seen set that deduplicates a 10^10-URL frontier without
shuffling raw URLs".

Design (SURVEY.md §2.3 J6, §4.2):

- The seen set is partitioned by ``bucket = pmod(xxhash64(host), B)``; each
  bucket owns an independent bloom blob sized for its URL count. At 10^10
  URLs and B=128, each blob is ~112 MB at 1% FPP — executor-memory sized.
- The bloom is a *no-false-negative prefilter only*. Candidates the filter
  calls "maybe seen" continue to an exact ``url_hash`` anti-join; "definitely
  new" candidates skip that join entirely. Bloom FPs therefore cost a join
  probe, never a wrongly-dropped novel URL (the north rule requires the
  exact seen set).
- Blobs are built executor-side per bucket (``applyInPandas`` over the seen
  table) and stored as binary rows in the snapshot; the membership probe
  runs inside ``mapInPandas`` with a per-worker blob cache — raw URLs never
  shuffle, only (bucket, url_hash).

All bit math is vectorized numpy over int64 hashes (no per-row Python).
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64


def _mix(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two derived probe hashes from one 64-bit hash (double hashing,
    Kirsch-Mitzenmacher: pos_i = h1 + i*h2)."""
    u = h.astype(np.int64).view(_U64)
    h1 = u
    h2 = (u >> _U64(33)) | _U64(1)  # odd => full-period stride
    return h1, h2


class BloomFilter:
    """Fixed-size bloom over int64 hashes. ``m_bits`` is rounded up to a
    multiple of 64."""

    def __init__(self, n_expected: int, fpp: float = 0.01, m_bits: int | None = None):
        if m_bits is None:
            n = max(1, n_expected)
            m_bits = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
        self.m_bits = max(64, (m_bits + 63) // 64 * 64)
        self.k = max(1, int(round(self.m_bits / max(1, n_expected) * math.log(2))))
        self.k = min(self.k, 16)
        self.bits = np.zeros(self.m_bits // 8, dtype=np.uint8)

    # ------------------------------------------------------------------
    def add_many(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        h1, h2 = _mix(np.asarray(hashes))
        m = _U64(self.m_bits)
        for i in range(self.k):
            pos = ((h1 + _U64(i) * h2) % m).astype(np.int64)
            np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: True = maybe seen, False = definitely new."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _mix(np.asarray(hashes))
        m = _U64(self.m_bits)
        out = np.ones(len(hashes), dtype=bool)
        for i in range(self.k):
            pos = ((h1 + _U64(i) * h2) % m).astype(np.int64)
            out &= (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return out

    def stats(self) -> dict:
        """Operational health: observed fill ratio, the standard occupancy
        entry estimate n̂ = -(m/k)·ln(1-fill), and the resulting FPP
        estimate fill^k. At 10^10-URL scale this is the signal that a
        bucket outgrew its sizing (fill → 1 means the prefilter stops
        filtering and every candidate pays the exact anti-join probe)."""
        set_bits = int(np.unpackbits(self.bits).sum())
        fill = set_bits / self.m_bits
        est_entries = (
            0.0 if fill >= 1.0 else -(self.m_bits / self.k) * math.log(1.0 - fill)
        )
        return {
            "kind": "bloom",
            "capacity": int(self.m_bits),
            "occupied": set_bits,
            "fill_ratio": fill,
            "est_entries": est_entries,
            "est_fpp": fill**self.k,
            "saturated": fill > 0.95,
        }

    # ------------------------------------------------------------------
    def to_bytes(self) -> bytes:
        header = np.array([self.m_bits, self.k], dtype=np.int64).tobytes()
        return header + self.bits.tobytes()

    @staticmethod
    def from_bytes(blob: bytes) -> "BloomFilter":
        m_bits, k = np.frombuffer(blob[:16], dtype=np.int64)
        bf = BloomFilter(n_expected=1, m_bits=int(m_bits))
        bf.k = int(k)
        bf.bits = np.frombuffer(blob[16:], dtype=np.uint8).copy()
        return bf


class CuckooFilter:
    """Cuckoo filter over int64 hashes — same prefilter interface as
    BloomFilter but supports deletes (needed if seen-set entries are ever
    retired, e.g. recrawl-after-TTL). 4-slot buckets, 16-bit fingerprints.

    The BloomStore fallback path (``filter_kind="cuckoo"``) uses this class
    through the same serialize/probe interface as BloomFilter.  A cuckoo
    table that fills past its kick budget cannot be rebuilt from its own
    fingerprints, so instead of corrupting (dropping an entry = a FALSE
    NEGATIVE = a wrongly-re-crawled URL) it flips a ``saturated`` flag:
    a saturated filter answers "maybe seen" for everything, degrading
    gracefully to the exact anti-join for that bucket — zero false
    negatives always (property-tested in tests/test_crawl.py).
    """

    SLOTS = 4

    def __init__(self, n_expected: int, max_kicks: int = 500):
        n_buckets = max(2, 1 << int(math.ceil(math.log2(max(1, n_expected) / self.SLOTS + 1))))
        self.n_buckets = n_buckets
        self.max_kicks = max_kicks
        self.saturated = False
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)  # 0 = empty

    def _fp(self, h: int) -> int:
        fp = (h >> 48) & 0xFFFF
        return fp if fp != 0 else 1

    def _i1(self, h: int) -> int:
        return h & (self.n_buckets - 1)

    def _i2(self, i1: int, fp: int) -> int:
        # xor with a cheap deterministic spread of the fingerprint
        return (i1 ^ (fp * 0x5BD1E995)) & (self.n_buckets - 1)

    def add(self, h: int) -> bool:
        h = h & 0xFFFFFFFFFFFFFFFF
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # displace
        rng_state = h
        i = i1
        for _ in range(self.max_kicks):
            rng_state = (rng_state * 6364136223846793005 + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
            slot = rng_state % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._i2(i, fp)
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        return False  # table full — caller should rebuild larger

    def contains(self, h: int) -> bool:
        if self.saturated:
            return True
        h = h & 0xFFFFFFFFFFFFFFFF
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    # ------------------------------------------------------ store interface
    def add_many(self, hashes: np.ndarray) -> None:
        """Sequential inserts (cuckoo displacement is inherently ordered);
        per-round per-bucket volumes are the small side of the crawl. A
        failed insert saturates the filter (class doc) instead of losing
        the entry."""
        for h in np.asarray(hashes, dtype=np.int64).tolist():
            if self.saturated:
                return
            if not self.add(int(h)):
                self.saturated = True

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: fingerprint + both candidate buckets for
        the whole batch in numpy (no per-row Python)."""
        n = len(hashes)
        if n == 0:
            return np.zeros(0, dtype=bool)
        if self.saturated:
            return np.ones(n, dtype=bool)
        u = np.asarray(hashes, dtype=np.int64).view(_U64)
        fp = ((u >> _U64(48)) & _U64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        mask = _U64(self.n_buckets - 1)
        i1 = (u & mask).astype(np.int64)
        i2 = ((i1.view(_U64) ^ (fp.astype(_U64) * _U64(0x5BD1E995))) & mask).astype(
            np.int64
        )
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def stats(self) -> dict:
        """Operational health: slot occupancy and FPP. An unsaturated
        4-slot/16-bit-fingerprint cuckoo answers "maybe" for ~2·4/2^16 of
        novel keys per probed bucket pair; a saturated one answers "maybe"
        for everything (fpp 1.0) — the graceful-degradation flag callers
        alert on (rebuild larger or accept full anti-join traffic)."""
        occupied = int((self.table != 0).sum())
        capacity = int(self.n_buckets * self.SLOTS)
        load = occupied / capacity
        return {
            "kind": "cuckoo",
            "capacity": capacity,
            "occupied": occupied,
            "fill_ratio": load,
            "est_entries": float(occupied),
            "est_fpp": 1.0 if self.saturated else 2 * self.SLOTS / 65536.0,
            "saturated": bool(self.saturated),
        }

    def to_bytes(self) -> bytes:
        header = np.array(
            [self.n_buckets, self.max_kicks, int(self.saturated)], dtype=np.int64
        ).tobytes()
        return header + self.table.tobytes()

    @staticmethod
    def from_bytes(blob: bytes) -> "CuckooFilter":
        n_buckets, max_kicks, saturated = np.frombuffer(blob[:24], dtype=np.int64)
        cf = CuckooFilter(n_expected=1, max_kicks=int(max_kicks))
        cf.n_buckets = int(n_buckets)
        cf.saturated = bool(saturated)
        cf.table = (
            np.frombuffer(blob[24:], dtype=np.uint16)
            .reshape(int(n_buckets), CuckooFilter.SLOTS)
            .copy()
        )
        return cf

    def delete(self, h: int) -> bool:
        h = h & 0xFFFFFFFFFFFFFFFF
        fp = self._fp(h)
        i1 = self._i1(h)
        i2 = self._i2(i1, fp)
        for i in (i1, i2):
            idx = np.nonzero(self.table[i] == fp)[0]
            if len(idx):
                self.table[i][idx[0]] = 0
                return True
        return False
