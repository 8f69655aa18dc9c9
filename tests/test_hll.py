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
