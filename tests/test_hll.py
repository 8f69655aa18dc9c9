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


def test_cross_engine_hll_query_high_cardinality(spark, tmp_path):
    """The registered hll_distinct_tokens query on a HIGH-cardinality
    corpus (the driver corpus's 31-token vocab only exercises the
    linear-counting branch; 20k distinct tokens forces the harmonic-mean
    estimator): engine result equals a pure-python md5 twin of the same
    register algebra bit-for-bit, and the estimate lands within 4 standard
    errors (1.04/sqrt(m) = 1.6%) of the exact count."""
    import math

    from news_crawler_slm_spark.functions.hashing import md5_long_py
    from news_crawler_slm_spark.plans.catalog_dedup import hll_distinct_tokens

    n_tok, per_doc = 20000, 40
    vocab = [f"tok{i}" for i in range(n_tok)]
    docs = [
        (i, " ".join(vocab[(i * per_doc + j) % n_tok] for j in range(per_doc)))
        for i in range(1000)
    ]
    out = str(tmp_path / "hll_hc")
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        f"{out}/documents.parquet"
    )
    row = hll_distinct_tokens(spark, out).collect()[0]

    # python twin of the register algebra (p=12, 60-bit md5 hash)
    p, m, wbits = 12, 4096, 48
    regs: dict[int, int] = {}
    seen = set()
    for _i, text in docs:
        for tok in text.strip().lower().split():
            seen.add(tok)
            h = md5_long_py(tok)
            r = h & (m - 1)
            w = h >> p
            rank = (wbits + 1) if w == 0 else wbits - w.bit_length() + 1
            regs[r] = max(regs.get(r, 0), rank)
    s = sum(1 << (wbits + 1 - r) for r in regs.values()) + (m - len(regs)) * (
        1 << (wbits + 1)
    )
    alpha_c = 0.7213 / (1 + 1.079 / m) * m * m * float(1 << (wbits + 1))
    raw = alpha_c / s
    zeros = m - len(regs)
    est = m * math.log(m / zeros) if (raw <= 2.5 * m and zeros > 0) else raw
    assert row["n_exact"] == len(seen) == n_tok
    assert row["registers_touched"] == len(regs)
    assert row["hll_estimate"] == round(est, 6)
    # estimator quality: the whole point of shipping the sketch
    assert abs(est - n_tok) / n_tok < 4 * 1.04 / math.sqrt(m)
    # the harmonic branch (not linear counting) is the one exercised here
    assert raw > 2.5 * m or zeros == 0


def test_crawl_host_hll_matches_batch(spark, tmp_path):
    """VERDICT r05 #7: the per-host distinct-URL HLL register table the
    crawl commits with each round (crawl/rounds.py, max-merge) must equal
    the BATCH sketch over the final seen table — register-for-register —
    and its estimates must track the true per-host url counts. Incremental
    (per-round merge) ≡ batch is the exactly-once evidence: a dropped or
    doubled round merge cannot produce equal registers."""
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.crawl.rounds import run_crawl, synthetic_fetcher
    from news_crawler_slm_spark.crawl.semantics import CrawlParams
    from news_crawler_slm_spark.functions import urls as U
    from news_crawler_slm_spark.operators.hll import hll_estimates_by, hll_registers_by
    from news_crawler_slm_spark.sources.synthetic_web import WebScale, web_dataframes
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog

    scale = WebScale(n_hosts=8, pages_per_host_max=12, links_per_page=4, seed=31)
    params = CrawlParams(round_budget=5.0, max_articles=10, max_rounds=4, host_hll_p=8)
    dfs = web_dataframes(spark, scale)
    root = str(tmp_path / "cat")
    run_crawl(
        spark, root, dfs["seeds"], dfs["robots"], synthetic_fetcher(dfs["web"]),
        params,
    )
    catalog = SnapshotCatalog(spark, root)

    got = {
        (r["host"], r["register"]): r["rank"]
        for r in catalog.read_table("host_url_hll").collect()
    }
    seen = catalog.read_table("seen").select(
        U.host_of(F.col("url")).alias("host"), "url"
    )
    want = {
        (r["host"], r["register"]): r["rank"]
        for r in hll_registers_by(seen, ["host"], "url", p=8).collect()
    }
    assert got == want and len(got) > 0

    # estimates track truth within the p=8 error envelope (~6.5% sigma)
    est = {
        r["host"]: r["estimate"]
        for r in hll_estimates_by(
            catalog.read_table("host_url_hll"), ["host"], p=8
        ).collect()
    }
    truth = {
        r["host"]: r["n"]
        for r in seen.groupBy("host").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(truth)
    for h, n in truth.items():
        assert abs(est[h] - n) / n < 0.3, (h, est[h], n)
