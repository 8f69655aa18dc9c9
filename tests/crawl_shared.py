"""Shared scale/params/helpers for the crawl-engine test files.

test_crawl.py (engine ≡ simulator, resume, compaction, filters) and
test_crawl_http.py (the real-HTTP fetch channel: gateway fetcher,
revalidation, Retry-After, cuckoo retirement) exercise the SAME crawl
configuration — one definition here so the two files can never drift,
and so the suite can run them in separate pytest processes
(scripts/shard_tests.py shards at file granularity; the crawl family was
the suite's single 10-minute file before the split)."""

from __future__ import annotations

from news_crawler_slm_spark.crawl.rounds import run_crawl, synthetic_fetcher
from news_crawler_slm_spark.crawl.semantics import CrawlParams
from news_crawler_slm_spark.sources.synthetic_web import WebScale, web_dataframes
from news_crawler_slm_spark.sources.tables import SnapshotCatalog

PARAMS = CrawlParams(round_budget=6.0, max_articles=12, max_rounds=8)
SCALE = WebScale(n_hosts=10, pages_per_host_max=20, links_per_page=4, seed=7)


def _run_engine(spark, root, use_bloom=True):
    dfs = web_dataframes(spark, SCALE)
    fetcher = synthetic_fetcher(dfs["web"])
    state = run_crawl(
        spark, root, dfs["seeds"], dfs["robots"], fetcher, PARAMS, use_bloom=use_bloom
    )
    return state, SnapshotCatalog(spark, root)


def _crawl_log(catalog):
    return [
        (r["round"], r["seq"], r["host"], r["url"], r["status"])
        for r in catalog.read_table("crawl_log").orderBy("round", "seq").collect()
    ]


def _retire_twin(sim_result, robots, ttl_rounds):
    """Pure-python oracle of retire_and_requeue's semantics: (retired set,
    requeued set, expected per-host fetched counts after retirement)."""
    import collections

    from news_crawler_slm_spark.crawl.semantics import host_of, is_disallowed

    cutoff = sim_result.rounds_run - ttl_rounds
    last = {}
    for r, _s, h, u, stat in sim_result.crawl_log:
        if u not in last or r > last[u][0]:
            last[u] = (r, stat, h)
    retired = {u for u in sim_result.seen if last[u][0] <= cutoff}
    robots_by_host = {h: (list(d or []), list(a or [])) for h, d, a, _cd in robots}
    requeued = {
        u
        for u in retired
        if not is_disallowed(u, *robots_by_host.get(host_of(u), (None, None)))
    }
    fetched = collections.Counter(
        h for _r, _s, h, _u, stat in sim_result.crawl_log if stat == "fetched"
    )
    dec = collections.Counter(
        last[u][2] for u in retired if last[u][1] == "fetched"
    )
    hc = {h: max(0, n - dec.get(h, 0)) for h, n in fetched.items()}
    return retired, requeued, hc
