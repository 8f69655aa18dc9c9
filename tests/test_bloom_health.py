"""Seen-filter operational health: per-filter stats() estimates against
ground truth and empirical FP rates, and the executor-side per-bucket
BloomStore.health_report."""

from __future__ import annotations

import numpy as np

from news_crawler_slm_spark.crawl.bloom import BloomFilter, CuckooFilter
from news_crawler_slm_spark.crawl.frontier import BloomStore
from news_crawler_slm_spark.crawl.semantics import CrawlParams

RNG = np.random.default_rng(7)


def _hashes(n: int) -> np.ndarray:
    return RNG.integers(-(2**63), 2**63 - 1, size=n, dtype=np.int64)


def test_bloom_stats_estimates_track_truth():
    n = 20_000
    bf = BloomFilter(n_expected=n, fpp=0.01)
    bf.add_many(_hashes(n))
    st = bf.stats()
    assert st["kind"] == "bloom" and not st["saturated"]
    assert 0 < st["fill_ratio"] < 0.6
    # occupancy-based entry estimate within 5% of the true insert count
    assert abs(st["est_entries"] - n) / n < 0.05
    # estimated FPP within the same order of magnitude as measured FPP
    probe = _hashes(50_000)
    fp = bf.contains_many(probe).mean()  # fresh random hashes ~ all novel
    assert st["est_fpp"] <= 0.05
    assert fp <= max(5 * st["est_fpp"], 0.002)


def test_bloom_stats_saturation_flag():
    bf = BloomFilter(n_expected=1, m_bits=64)  # tiny: will fill
    bf.add_many(_hashes(500))
    st = bf.stats()
    assert st["saturated"] and st["est_fpp"] > 0.5


def test_cuckoo_stats_and_saturation():
    cf = CuckooFilter(n_expected=4096)
    hs = _hashes(2000)
    cf.add_many(hs)
    st = cf.stats()
    assert st["kind"] == "cuckoo" and not st["saturated"]
    # distinct 16-bit fingerprints can collide within a bucket pair, so
    # occupied <= inserts, but nothing vanishes silently beyond that
    assert 0.95 * len(hs) <= st["occupied"] <= len(hs)
    assert st["est_fpp"] < 0.001

    tiny = CuckooFilter(n_expected=8)
    tiny.add_many(_hashes(500))
    st2 = tiny.stats()
    assert st2["saturated"] and st2["est_fpp"] == 1.0


def test_bloomstore_health_report_per_bucket(spark, tmp_path):
    for kind in ("bloom", "cuckoo"):
        store = BloomStore(
            str(tmp_path / kind),
            CrawlParams(n_buckets=4),
            bits_per_bucket=1 << 14,
            filter_kind=kind,
        )
        seen = spark.createDataFrame(
            [(int(h) % 4, int(h)) for h in _hashes(400)],
            "bucket int, url_hash long",
        )
        store.update(seen, prev_snap=None, snap=1)
        rows = {r["bucket"]: r for r in store.health_report(spark, 1).collect()}
        assert set(rows) == {0, 1, 2, 3}
        for b, r in rows.items():
            assert r["kind"] == kind
            assert r["occupied"] > 0
            assert 0.0 < r["fill_ratio"] < 1.0
            assert not r["saturated"]
