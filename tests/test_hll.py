"""HyperLogLog sketch: registers bit-exact vs the pure-python xxh64 twin,
estimate within the theoretical error band, merge = sketch-of-union, and
partitioning invariance (the determinism contract every sketch here holds)."""

from __future__ import annotations

import math

from news_crawler_slm_spark.operators.hll import (
    hll_estimate,
    hll_registers,
    merge_registers,
)
from xxh64_oracle import xxh64_long, xxh64_str


def _twin_registers(values, p=12, long=False):
    m = 1 << p
    regs: dict[int, int] = {}
    for v in set(values):
        h = (xxh64_long(v) if long else xxh64_str(v)) & 0xFFFFFFFFFFFFFFFF
        j = h & (m - 1)
        w = h >> p
        rank = (64 - p) + 1 if w == 0 else (64 - p) - w.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rank)
    return regs


def test_registers_match_python_twin_and_partitioning(spark):
    urls = [f"https://h{i % 97}.example.com/p{i}" for i in range(20000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r.register: r.rank for r in hll_registers(df, "url").collect()
    }
    assert got == _twin_registers(urls)
    # partitioning invariance: same sketch from a 1-partition layout
    got1 = {
        r.register: r.rank
        for r in hll_registers(df.coalesce(1), "url").collect()
    }
    assert got1 == got


def test_estimate_within_error_band(spark):
    n = 20000
    df = spark.createDataFrame(
        [(f"https://h/{i}",) for i in range(n)], "url string"
    )
    est = hll_estimate(hll_registers(df, "url"))
    # 1.04/sqrt(4096) ~= 1.6% standard error; allow 5 sigma
    assert abs(est - n) / n < 5 * 1.04 / math.sqrt(4096)


def test_merge_equals_sketch_of_union(spark):
    a = spark.createDataFrame([(f"u{i}",) for i in range(5000)], "v string")
    b = spark.createDataFrame([(f"u{i}",) for i in range(2500, 7500)], "v string")
    both = a.unionByName(b)
    merged = {
        r.register: r.rank
        for r in merge_registers(
            hll_registers(a, "v"), hll_registers(b, "v")
        ).collect()
    }
    direct = {r.register: r.rank for r in hll_registers(both, "v").collect()}
    assert merged == direct


def test_long_keys_and_duplicates_do_not_move_the_sketch(spark):
    ids = list(range(3000))
    df = spark.createDataFrame([(i,) for i in ids + ids], "doc_id long")
    got = {r.register: r.rank for r in hll_registers(df, "doc_id").collect()}
    assert got == _twin_registers(ids, long=True)


def test_grouped_registers_and_estimates(spark):
    """Per-group sketches: each group's register table is bit-exact the
    single-sketch twin over that group alone, and the distributed
    applyInPandas estimator matches the driver-side estimator per group
    (and lands within the error band of the true per-group cardinality)."""
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.operators.hll import (
        hll_estimate,
        hll_estimates_by,
        hll_registers,
        hll_registers_by,
    )

    rows = [("h%d" % (i % 4), "u%d" % (i % (50 * (1 + i % 4)))) for i in range(4000)]
    df = spark.createDataFrame(rows, "host string, url string").repartition(9)

    grouped = hll_registers_by(df, ["host"], "url", p=12)
    got = {}
    for r in grouped.collect():
        got.setdefault(r["host"], {})[r["register"]] = r["rank"]
    for h in sorted({g for g, _u in rows}):
        solo = hll_registers(df.where(F.col("host") == h), "url", p=12)
        exp = {r["register"]: r["rank"] for r in solo.collect()}
        assert got[h] == exp, h

    est = {r["host"]: r["estimate"] for r in hll_estimates_by(grouped, ["host"], p=12).collect()}
    truth = {}
    for h, u in rows:
        truth.setdefault(h, set()).add(u)
    for h, urls in truth.items():
        solo = hll_registers(df.where(F.col("host") == h), "url", p=12)
        assert abs(est[h] - hll_estimate(solo, p=12)) < 1e-9, h
        assert abs(est[h] - len(urls)) / len(urls) < 0.05, (h, est[h], len(urls))
