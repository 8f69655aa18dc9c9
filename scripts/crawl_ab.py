#!/usr/bin/env python
"""Interleaved A/B for the r04 crawl steady-pps reading (VERDICT r04 #5).

BENCH_r04 recorded steady 389.8 pps, below the repo's documented 446-720
steal band. r04 touched build_round (the conditional-revalidation channel:
an extra constant-false status branch and a null etag column in the pages
delta when the fetcher has no validator channel). This script attributes
the drift: it runs the bench crawl protocol INTERLEAVED, alternating

  A: the current build_round (r04, revalidation channel present), vs
  B: an r03-equivalent build_round (no revalidation branch, no etag
     column) monkeypatched in — byte-for-byte the pre-r04 round shape on
     the synthetic-fetcher path,

best-of-N each, on the identical parquet corpus. If A ~= B the 389.8 was
steal weather and the band stands (annotate BASELINE.md); if B >> A the
revalidation channel costs real throughput and needs a fix.

Usage: python scripts/crawl_ab.py [repeats]   (default 3)
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3

# reuse the bench protocol wholesale — same corpus sizes, same session
# shape, same steady-state definition
os.environ.setdefault("SPARK_GRAFT_BENCH_HOSTS", "64")
os.environ.setdefault("SPARK_GRAFT_BENCH_PAGES", "192")
import bench  # noqa: E402


def _build_round_r03(state, robots, fetcher, params, bloom=None):
    """build_round exactly as it stood before the r04 revalidation channel:
    no not_modified/etag handling — the two-branch status and an etag-free
    pages delta. Everything else is the shared current code (imported, not
    copied), so the ONLY delta under test is the revalidation channel."""
    import time as _time

    from pyspark.sql import functions as F

    from news_crawler_slm_spark.crawl.frontier import attach_seq
    from news_crawler_slm_spark.crawl.rounds import (
        RoundDeltas,
        dedup_new_urls,
        discover_links,
        pop_round_raw,
    )
    from news_crawler_slm_spark.functions.udfs import clean_html_udf

    rnd = state.round + 1
    popped_raw = pop_round_raw(
        state.frontier, robots, state.host_counts, params, state.host_delays
    ).cache()
    t_pop = _time.monotonic()
    n_popped = popped_raw.count()
    pop_latency = _time.monotonic() - t_pop
    popped = attach_seq(popped_raw, n_popped)
    fetched_full = fetcher(popped)
    fetched_slim = fetched_full.drop("html").cache()
    cache_handle = fetched_slim
    ok_slim = fetched_slim.where(F.col("fetch_ok"))

    log_delta = fetched_slim.select(
        F.lit(rnd).alias("round"),
        "seq",
        "host",
        "url",
        F.when(F.col("fetch_ok"), "fetched").otherwise("failed").alias("status"),
    )
    pages_delta = fetched_full.where(F.col("fetch_ok")).select(
        "url",
        clean_html_udf(F.col("html")).alias("text"),
        "lang",
        "publisher",
        F.lit(rnd).alias("fetch_round"),
        F.lit(None).cast("string").alias("etag"),  # schema parity for append
    )

    frontier_rest = state.frontier.join(
        popped_raw.select("url_hash"), "url_hash", "left_anti"
    )
    candidates = discover_links(
        ok_slim.select("url", "priority", "depth", "out_links"), robots, params, rnd
    )
    novel = dedup_new_urls(
        candidates,
        state.seen,
        frontier_rest,
        bloom,
        state.round if (bloom is not None and state.round > 0) else None,
    ).select(
        "bucket", "salt", "host", "url", "url_hash", "priority", "depth",
        "discovered_round",
    )
    novel = novel.join(popped_raw.select("url_hash"), "url_hash", "left_anti")

    counts_new = (
        state.host_counts.unionByName(
            ok_slim.groupBy("host").agg(F.count("*").alias("fetched"))
        )
        .groupBy("host")
        .agg(F.sum("fetched").alias("fetched"))
    )

    deltas = RoundDeltas(
        frontier=frontier_rest.unionByName(novel),
        host_counts=counts_new,
        seen_delta=popped_raw.select("bucket", "url_hash", "url"),
        pages_delta=pages_delta,
        log_delta=log_delta,
        host_delays=None,
    )
    return deltas, popped_raw, cache_handle, n_popped, pop_latency


def main() -> None:
    from news_crawler_slm_spark.crawl import rounds as rounds_mod

    corpus_dir = tempfile.mkdtemp(prefix="crawl_ab_corpus_")
    current = rounds_mod.build_round
    results: dict[str, list] = {"r04_current": [], "r03_equiv": []}
    for rep in range(REPEATS):
        for name, impl in (("r04_current", current), ("r03_equiv", _build_round_r03)):
            rounds_mod.build_round = impl
            try:
                r = bench.bench_crawl(bench.CPUS, bench.CRAWL_ROUNDS, corpus_dir)
            finally:
                rounds_mod.build_round = current
            results[name].append(r)
            print(
                f"rep{rep} {name}: steady={r['steady_pages_per_sec']}"
                f" total={r['pages_per_sec']} pop={r['pop_latency_s']}",
                file=sys.stderr,
            )

    def best(name, key):
        return max(x[key] for x in results[name])

    out = {
        "repeats": REPEATS,
        "steady_best": {n: best(n, "steady_pages_per_sec") for n in results},
        "total_best": {n: best(n, "pages_per_sec") for n in results},
        "steady_all": {
            n: [x["steady_pages_per_sec"] for x in rs] for n, rs in results.items()
        },
    }
    out["steady_ratio_r03_over_r04"] = round(
        out["steady_best"]["r03_equiv"] / out["steady_best"]["r04_current"], 3
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
