"""Adaptive per-host politeness (AIMD backoff): the effective crawl delay
doubles on failure rounds and recovers on success rounds, the politeness
budget follows it, snapshots persist it across resume, and the default-off
path stays byte-identical to the fixed-delay contract."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from news_crawler_slm_spark import schemas
from news_crawler_slm_spark.crawl.frontier import aimd_delay_col
from news_crawler_slm_spark.crawl.rounds import run_crawl, synthetic_fetcher
from news_crawler_slm_spark.crawl.semantics import (
    ADAPTIVE_DELAY_MAX,
    CrawlParams,
    aimd_delay,
)

SLOW = "slow.example.com"
FAST = "fast.example.com"


def test_aimd_column_matches_python_twin(spark):
    cases = list(
        itertools.product(
            [None, 0.0, -1.0, 0.5, 1.0, 2.0, 40.0, ADAPTIVE_DELAY_MAX],
            [None, 0.0, 1.0, 3.0],
            [True, False],
        )
    )
    df = spark.createDataFrame(
        cases, "cur double, base double, had_fail boolean"
    ).withColumn(
        "next", aimd_delay_col(F.col("cur"), F.col("base"), F.col("had_fail"))
    )
    for r in df.collect():
        assert r.next == pytest.approx(
            aimd_delay(r.cur, r.base, r.had_fail), abs=1e-12
        ), (r.cur, r.base, r.had_fail)


def _two_host_world(spark, n_pages=12):
    urls = {h: [f"https://{h}/p{i}" for i in range(n_pages)] for h in (SLOW, FAST)}
    web = spark.createDataFrame(
        [
            (u, b"<html><body><p>x</p></body></html>", [], True, "en", h)
            for h in (SLOW, FAST)
            for u in urls[h]
        ],
        schemas.WEB,
    )
    seeds = spark.createDataFrame(
        [
            (u, h, h, 1, False, float(n_pages - i))
            for h in (SLOW, FAST)
            for i, u in enumerate(urls[h])
        ],
        schemas.SEEDS,
    )
    robots = spark.createDataFrame(
        [(SLOW, [], [], 1.0), (FAST, [], [], 1.0)], schemas.ROBOTS
    )

    base = synthetic_fetcher(web)

    def failing_fetch(popped):
        # the slow host serves every request with an error; fast is healthy
        return base(popped).withColumn(
            "fetch_ok", F.col("fetch_ok") & (F.col("host") != SLOW)
        )

    return seeds, robots, failing_fetch


def _pops_by_round_host(spark, catalog_root):
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog

    log = SnapshotCatalog(spark, catalog_root).read_table("crawl_log")
    return {
        (r["round"], r["host"]): r["n"]
        for r in log.groupBy("round", "host").agg(F.count("*").alias("n")).collect()
    }


def test_backoff_shrinks_failing_host_budget(spark, tmp_path):
    """round_budget=4, base delay 1s: the failing host pops 4, then (delay
    2s) 2, then (delay 4s) 1 — while the healthy host keeps popping 4."""
    seeds, robots, fetch = _two_host_world(spark)
    params = CrawlParams(
        round_budget=4.0, n_buckets=2, n_salts=2, adaptive_politeness=True
    )
    run_crawl(
        spark, str(tmp_path / "cat"), seeds, robots, fetch, params, max_rounds=3
    )
    pops = _pops_by_round_host(spark, str(tmp_path / "cat"))
    assert pops[(1, SLOW)] == 4 and pops[(2, SLOW)] == 2 and pops[(3, SLOW)] == 1
    assert pops[(1, FAST)] == 4 and pops[(2, FAST)] == 4 and pops[(3, FAST)] == 4


def test_default_off_keeps_fixed_budgets(spark, tmp_path):
    """adaptive_politeness=False (default): failures change nothing — the
    simulator-equivalence contract's fixed robots-delay budget."""
    seeds, robots, fetch = _two_host_world(spark)
    params = CrawlParams(round_budget=4.0, n_buckets=2, n_salts=2)
    run_crawl(
        spark, str(tmp_path / "cat"), seeds, robots, fetch, params, max_rounds=3
    )
    pops = _pops_by_round_host(spark, str(tmp_path / "cat"))
    for rnd in (1, 2, 3):
        assert pops[(rnd, SLOW)] == 4
        assert pops[(rnd, FAST)] == 4


def test_adaptive_state_survives_resume(spark, tmp_path):
    """Kill after round 1 and resume: the remaining rounds must see the
    persisted host_delays and produce the identical crawl log and final
    delay table as an uninterrupted 3-round run."""
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog

    seeds, robots, fetch = _two_host_world(spark)
    params = CrawlParams(
        round_budget=4.0, n_buckets=2, n_salts=2, adaptive_politeness=True
    )

    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    run_crawl(spark, a, seeds, robots, fetch, params, max_rounds=3)
    run_crawl(spark, b, seeds, robots, fetch, params, max_rounds=1)
    run_crawl(spark, b, seeds, robots, fetch, params, max_rounds=2)

    def log_rows(root):
        return sorted(
            tuple(r)
            for r in SnapshotCatalog(spark, root).read_table("crawl_log").collect()
        )

    def delays(root):
        return sorted(
            tuple(r)
            for r in SnapshotCatalog(spark, root).read_table("host_delays").collect()
        )

    assert log_rows(a) == log_rows(b)
    assert delays(a) == delays(b)
    # after three all-fail rounds the slow host sits at 1 -> 2 -> 4 -> 8
    d = dict(delays(a))
    assert d[SLOW] == 8.0
    assert d[FAST] == 1.0
