"""Crawl round loop: Structured-Streaming-style micro-batches over the
frontier, committed as snapshots, resumable from any checkpoint.

Each round (reference analog: one publisher's crawl of ≤ max_articles,
crawl_articles.py:93-100 — here all hosts advance concurrently):

  pop (W5, politeness budget) → fetch → extract (clean_html Arrow UDF)
  → discover links → bloom+exact seen dedup → commit snapshot(round)

State shape per round:
- frontier, host_counts: rewritten (content churns, both bounded).
- seen, pages, crawl_log: append-only deltas — the snapshot manifest chains
  delta files (Iceberg append pattern). Writing O(round) not O(history) is
  what keeps a 10^10-URL crawl's commit cost flat.
- exactly ONE counting action per round (crawl-log delta groupBy status),
  which doubles as the stop condition and materializes the cached pop.

A snapshot commits atomically or not at all; ``run_crawl`` with the same
catalog root resumes from the latest committed snapshot and produces
byte-identical state to an uninterrupted run (tested in test_crawl.py).
Exact ordering equivalence with the sequential simulator rules out async
triggers — rounds are deterministic batch jobs driven from here
(SURVEY.md §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.udfs import clean_html_udf
from ..sources.tables import SnapshotCatalog
from .frontier import (
    BloomStore,
    dedup_new_urls,
    discover_links,
    frontier_from_seeds,
    pop_round,
)
from .semantics import CrawlParams

Fetcher = Callable[[DataFrame], DataFrame]


def synthetic_fetcher(web: DataFrame) -> Fetcher:
    """Offline fetch backend: left-join the deterministic web table by
    canonical url. A real deployment swaps this for a mapInPandas HTTP
    stage with per-task timeouts (config.json:6 analog) — same contract:
    adds html, out_links, fetch_ok, lang, publisher."""

    def fetch(popped: DataFrame) -> DataFrame:
        w = web.select(
            F.col("url").alias("w_url"), "html", "out_links", "fetch_ok", "lang", "publisher"
        )
        joined = popped.join(w, popped.url == w.w_url, "left").drop("w_url")
        return joined.withColumn(
            "fetch_ok", F.coalesce(F.col("fetch_ok"), F.lit(False))
        )

    return fetch


@dataclass
class CrawlState:
    """Loop state. pages/crawl_log stay on disk during the loop (they are
    write-only for the crawl); read them via the catalog afterwards."""

    round: int
    frontier: DataFrame
    seen: DataFrame
    host_counts: DataFrame


@dataclass
class RoundDeltas:
    frontier: DataFrame  # full rewrite
    host_counts: DataFrame  # full rewrite
    seen_delta: DataFrame
    pages_delta: DataFrame
    log_delta: DataFrame


def _empty(spark: SparkSession, ddl: str) -> DataFrame:
    return spark.createDataFrame([], ddl)


def init_state(
    spark: SparkSession, seeds: DataFrame, robots: DataFrame, params: CrawlParams
) -> CrawlState:
    return CrawlState(
        round=0,
        frontier=frontier_from_seeds(seeds, robots, params),
        seen=_empty(spark, "bucket int, url_hash long, url string"),
        host_counts=_empty(spark, "host string, fetched long"),
    )


def build_round(
    state: CrawlState,
    robots: DataFrame,
    fetcher: Fetcher,
    params: CrawlParams,
    bloom: BloomStore | None = None,
) -> tuple[RoundDeltas, DataFrame, DataFrame]:
    """Assemble one round's lazy plan. Returns (deltas, popped, fetched_raw);
    popped/fetched_raw are cached and must be unpersisted by the caller."""
    rnd = state.round + 1

    popped = pop_round(state.frontier, robots, state.host_counts, params).cache()
    fetched_raw = fetcher(popped).cache()
    ok = fetched_raw.where(F.col("fetch_ok"))

    log_delta = fetched_raw.select(
        F.lit(rnd).alias("round"),
        "seq",
        "host",
        "url",
        F.when(F.col("fetch_ok"), "fetched").otherwise("failed").alias("status"),
    )
    pages_delta = ok.select(
        "url",
        clean_html_udf(F.col("html")).alias("text"),
        "lang",
        "publisher",
        F.lit(rnd).alias("fetch_round"),
    )

    frontier_rest = state.frontier.join(
        popped.select("url_hash"), "url_hash", "left_anti"
    )
    candidates = discover_links(
        ok.select("url", "priority", "depth", "out_links"), robots, params, rnd
    )
    novel = dedup_new_urls(
        candidates,
        state.seen,
        frontier_rest,
        bloom,
        state.round if (bloom is not None and state.round > 0) else None,
    ).select(
        "bucket", "salt", "host", "url", "url_hash", "priority", "depth", "discovered_round"
    )
    novel = novel.join(popped.select("url_hash"), "url_hash", "left_anti")

    counts_new = (
        state.host_counts.unionByName(
            ok.groupBy("host").agg(F.count("*").alias("fetched"))
        )
        .groupBy("host")
        .agg(F.sum("fetched").alias("fetched"))
    )

    deltas = RoundDeltas(
        frontier=frontier_rest.unionByName(novel),
        host_counts=counts_new,
        seen_delta=popped.select("bucket", "url_hash", "url"),
        pages_delta=pages_delta,
        log_delta=log_delta,
    )
    return deltas, popped, fetched_raw


def run_crawl(
    spark: SparkSession,
    catalog_root: str,
    seeds: DataFrame,
    robots: DataFrame,
    fetcher: Fetcher,
    params: CrawlParams = CrawlParams(),
    use_bloom: bool = True,
    max_rounds: int | None = None,
    output_partitions: int | None = 1,
) -> CrawlState:
    """Run (or resume) a crawl; one snapshot per round.

    Resume: if ``catalog_root`` holds a committed snapshot, state loads from
    it and the loop continues at the next round — the reference analog is
    the finished_publishers.txt skip (crawl_articles.py:61-70) but with
    atomic round granularity instead of whole-publisher truncate-on-rerun.

    ``output_partitions=1`` suits test-scale states; pass None at scale to
    keep natural partitioning.
    """
    catalog = SnapshotCatalog(spark, catalog_root)
    bloom = BloomStore(catalog_root, params) if use_bloom else None

    snap = catalog.snapshot()
    if snap is not None:
        state = CrawlState(
            round=int(snap.counters["round"]),
            frontier=catalog.read_table("frontier"),
            seen=catalog.read_table("seen"),
            host_counts=catalog.read_table("host_counts"),
        )
    else:
        state = init_state(spark, seeds, robots, params)

    rounds_left = max_rounds if max_rounds is not None else params.max_rounds - state.round
    for _ in range(max(0, rounds_left)):
        deltas, popped, fetched_raw = build_round(state, robots, fetcher, params, bloom)
        rnd = state.round + 1

        # single counting action: stop condition + counters + cache warm-up
        status_counts = {
            r["status"]: r["n"]
            for r in deltas.log_delta.groupBy("status").agg(F.count("*").alias("n")).collect()
        }
        n_popped = sum(status_counts.values())
        if n_popped == 0:
            popped.unpersist()
            fetched_raw.unpersist()
            break

        if bloom is not None:
            bloom.update(deltas.seen_delta, state.round if state.round > 0 else None, rnd)

        counters = {
            "round": rnd,
            "popped": n_popped,
            "fetched": status_counts.get("fetched", 0),
            "failed": status_counts.get("failed", 0),
        }
        catalog.commit(
            rnd,
            tables={"frontier": deltas.frontier, "host_counts": deltas.host_counts},
            appends={
                "seen": deltas.seen_delta,
                "pages": deltas.pages_delta,
                "crawl_log": deltas.log_delta,
            },
            counters=counters,
            output_partitions=output_partitions,
        )
        popped.unpersist()
        fetched_raw.unpersist()
        # re-read committed state: truncates lineage; every round is a pure
        # function of durable snapshots
        state = CrawlState(
            round=rnd,
            frontier=catalog.read_table("frontier"),
            seen=catalog.read_table("seen"),
            host_counts=catalog.read_table("host_counts"),
        )
    return state
