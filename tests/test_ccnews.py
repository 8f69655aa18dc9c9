"""CC-News archive backend (crawl/ccnews.py): per-publisher caps,
deprecated skip, publisher resolution fallback, archive-duplicate
handling, and extraction byte-identity with the live path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_crawler_slm_spark.crawl.ccnews import ccnews_ingest
from news_crawler_slm_spark.crawl.semantics import CrawlParams, host_of
from news_crawler_slm_spark.functions.html_clean import clean_html
from news_crawler_slm_spark.sources.synthetic_web import WebScale, generate_web, web_dataframes
from news_crawler_slm_spark.sources.warc import write_warc

SCALE = WebScale(n_hosts=8, pages_per_host_max=12, seed=23)
MAXA = 5


@pytest.fixture(scope="module")
def corpus():
    return generate_web(SCALE)


def _archive(spark, tmp_path, with_publisher=True):
    """Export the synthetic web as 2 WARC segments with deterministic
    timestamps (archive order = url-hash order, stable across runs)."""
    dfs = web_dataframes(spark, SCALE)
    pages = dfs["web"].select(
        "url",
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.pmod(F.xxhash64("url"), F.lit(10_000)) * 1_000_000
        ).alias("warc_ts"),
        "html",
        "lang",
        *([F.col("publisher")] if with_publisher else []),
    )
    out = str(tmp_path / "segments")
    write_warc(pages.repartition(2, "url"), out, compress=True)
    return dfs, pages, out


def _expected(spark, pages_df, seeds_df, max_articles):
    """Pure-python twin of the cap semantics."""
    seeds = {
        r["host"]: (r["publisher"], bool(r["deprecated"]))
        for r in seeds_df.collect()
        if r["publisher"] is not None
    }
    rows = pages_df.collect()
    per_pub: dict[str, list] = {}
    for r in rows:
        host = host_of(r["url"])
        pub = r["publisher"] if "publisher" in r.__fields__ else None
        if pub is None:
            pub = seeds.get(host, (None, False))[0]
        if pub is None or seeds.get(host, (None, False))[1]:
            continue
        per_pub.setdefault(pub, []).append((r["warc_ts"], r["url"]))
    keep = set()
    for pub, lst in per_pub.items():
        for ts, url in sorted(lst)[:max_articles]:
            keep.add(url)
    return keep


def test_ccnews_caps_and_extraction(spark, tmp_path, corpus):
    dfs, pages, out = _archive(spark, tmp_path)
    got = ccnews_ingest(spark, out, dfs["seeds"], CrawlParams(max_articles=MAXA))
    rows = got.collect()

    want_urls = _expected(spark, pages, dfs["seeds"], MAXA)
    assert {r["url"] for r in rows} == want_urls

    # per-publisher cap honored and deprecated publishers absent
    seeds_rows = dfs["seeds"].collect()
    deprecated_pubs = {r["publisher"] for r in seeds_rows if r["deprecated"]}
    per_pub: dict[str, int] = {}
    for r in rows:
        per_pub[r["publisher"]] = per_pub.get(r["publisher"], 0) + 1
        assert r["publisher"] not in deprecated_pubs
    assert per_pub and all(n <= MAXA for n in per_pub.values())

    # extraction chain byte-identity with the live path's clean_html
    web_rows = {r["url"]: bytes(r["html"]) for r in web_dataframes(spark, SCALE)["web"].collect()}
    for r in rows:
        assert r["text"] == clean_html(web_rows[r["url"]].decode("utf-8")), r["url"]

    # position is a dense stable global ordinal over (publisher, ts, url)
    order = sorted((r["publisher"], r["warc_ts"], r["url"]) for r in rows)
    by_pos = {r["position"]: (r["publisher"], r["warc_ts"], r["url"]) for r in rows}
    assert [by_pos[i] for i in range(len(rows))] == order


def test_ccnews_publisher_fallback_from_seeds(spark, tmp_path, corpus):
    """Foreign archives carry no publisher header: resolution falls back
    to the seed list's host -> publisher map, with identical selection."""
    dfs, pages, out = _archive(spark, tmp_path, with_publisher=False)
    got = ccnews_ingest(spark, out, dfs["seeds"], CrawlParams(max_articles=MAXA))
    want_urls = _expected(spark, pages, dfs["seeds"], MAXA)
    assert {r["url"] for r in got.collect()} == want_urls
    # every emitted row carries the seed-resolved publisher
    seeds = {r["host"]: r["publisher"] for r in dfs["seeds"].collect()}
    for r in got.collect():
        assert r["publisher"] == seeds[host_of(r["url"])], r["url"]


def test_ccnews_archive_duplicates_collapse(spark, tmp_path, corpus):
    """Archives carry re-fetches of the same url; the earliest record
    wins and duplicates never consume cap budget."""
    dfs, pages, out = _archive(spark, tmp_path)
    # duplicate EVERY page one hour later with different (decoy) bytes
    dup = pages.withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR")
    ).withColumn("html", F.lit(b"<html><body>late refetch</body></html>"))
    write_warc(dup.repartition(2, "url"), str(tmp_path / "segments" / "refetch"), compress=True)

    got = ccnews_ingest(spark, out, dfs["seeds"], CrawlParams(max_articles=MAXA))
    want_urls = _expected(spark, pages, dfs["seeds"], MAXA)
    assert {r["url"] for r in got.collect()} == want_urls
    # the earliest (original) bytes won
    for r in got.collect():
        assert b"late refetch" not in bytes(r["html"]), r["url"]
