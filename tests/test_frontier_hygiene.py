"""Frontier hygiene: crawler-trap URL filtering (Column ≡ pure-python
lockstep, opt-in wiring at seed insert and link discovery) and OPIC-lite
in-degree re-prioritization against a hand-computed twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from news_crawler_slm_spark.crawl import semantics as SEM
from news_crawler_slm_spark.crawl.frontier import (
    discover_links,
    frontier_from_seeds,
    is_trap_col,
    reprioritize_frontier,
)
from news_crawler_slm_spark.crawl.semantics import CrawlParams

H = "https://news0.example.com"

TRAP_CASES = [
    # (url, is_trap)
    (f"{H}/p0", False),
    (f"{H}/world/politics/2026/08/17/article-slug", False),
    (f"{H}/a?x=1&y=2&z=3", False),
    (f"{H}/" + "/".join(f"s{i}" for i in range(13)), True),  # too deep
    (f"{H}/cal/2026/cal/2026/cal/2026", False),  # alternating, not a run
    (f"{H}/a/b/b/b/c", True),  # segment repeated 3x consecutively
    (f"{H}/a/b/b/c", False),  # only 2x
    (f"{H}/search?" + "&".join(f"f{i}=v" for i in range(9)), True),  # params
    (f"{H}/x" + "y" * SEM.TRAP_MAX_URL_LEN, True),  # over-long
    (f"{H}/", False),
    (f"{H}/p?{'a' * 40}", False),  # one long param is fine
]


def test_is_trap_pure_python_cases():
    for url, want in TRAP_CASES:
        assert SEM.is_trap(url) == want, url


def test_is_trap_col_lockstep_with_pure(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(TRAP_CASES)], "i long, url string"
    )
    got = {
        r["i"]: r["t"] for r in df.select("i", is_trap_col(F.col("url")).alias("t")).collect()
    }
    for i, (url, want) in enumerate(TRAP_CASES):
        assert got[i] == want, url


def _robots(spark):
    return spark.createDataFrame(
        [("news0.example.com", [], [], 1.0)],
        "host string, disallow array<string>, allow array<string>, crawl_delay double",
    )


def test_trap_filter_wiring_is_opt_in(spark):
    trap = f"{H}/a/b/b/b/c"
    fetched = spark.createDataFrame(
        [(f"{H}/p0", 5.0, 0, [f"{H}/p1", trap])],
        "url string, priority double, depth int, out_links array<string>",
    )
    robots = _robots(spark)
    on = CrawlParams(trap_filter=True)
    off = CrawlParams()
    got_on = {r["url"] for r in discover_links(fetched, robots, on, 1).collect()}
    got_off = {r["url"] for r in discover_links(fetched, robots, off, 1).collect()}
    assert got_on == {f"{H}/p1"}
    assert got_off == {f"{H}/p1", trap}

    seeds = spark.createDataFrame(
        [(trap, "news0.example.com", None, None, False, 1.0),
         (f"{H}/p0", "news0.example.com", None, None, False, 1.0)],
        "url string, host string, publisher string, publisher_rank int, "
        "deprecated boolean, priority double",
    )
    assert {r["url"] for r in frontier_from_seeds(seeds, robots, on).collect()} == {
        f"{H}/p0"
    }
    assert {r["url"] for r in frontier_from_seeds(seeds, robots, off).collect()} == {
        f"{H}/p0",
        trap,
    }


def test_reprioritize_frontier_matches_hand_twin(spark):
    seeds = spark.createDataFrame(
        [(f"{H}/p{i}", "news0.example.com", None, None, False, float(10 - i))
         for i in range(4)],
        "url string, host string, publisher string, publisher_rank int, "
        "deprecated boolean, priority double",
    )
    frontier = frontier_from_seeds(seeds, _robots(spark), CrawlParams())
    # p1 linked twice (once via a trailing-slash variant that must
    # canonicalize onto it), p2 once, p3 from a non-fetchable link (ignored)
    fetched = spark.createDataFrame(
        [
            (f"{H}/x", [f"{H}/p1", f"{H}/p2"]),
            (f"{H}/y", [f"{H}/p1/", "mailto:p3@x"]),
            (f"{H}/z", None),
        ],
        "url string, out_links array<string>",
    )
    before = {r["url"]: r["priority"] for r in frontier.collect()}
    out = reprioritize_frontier(frontier, fetched, weight=2.0)
    assert out.columns == frontier.columns  # schema-preserving
    got = {r["url"]: r["priority"] for r in out.collect()}
    indeg = {f"{H}/p1": 2, f"{H}/p2": 1}
    for url, p0 in before.items():
        want = p0 + 2.0 * math.log1p(indeg.get(url, 0))
        assert abs(got[url] - want) < 1e-12, url
        assert got[url] >= p0  # monotone: never demotes
