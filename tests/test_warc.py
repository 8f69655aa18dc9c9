"""WARC source/sink (sources/warc.py): round-trip exactness, adversarial
payloads, deterministic re-export, gzip variant, and the crawl-catalog
export path."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from news_crawler_slm_spark.schemas import PAGES
from news_crawler_slm_spark.sources.warc import read_warc, write_warc

TS = dt.datetime(2024, 5, 17, 8, 30, 15, 123456)


def _pages_df(spark):
    rows = [
        Row(
            url="https://news0.example.com/p0",
            warc_ts=TS,
            html=b"<html><body>plain</body></html>",
            text="plain",
            lang="en",
            publisher="news0",
            position=0,
        ),
        Row(  # NULL timestamp + NULL metadata + empty body
            url="https://news1.example.com/p1",
            warc_ts=None,
            html=b"",
            text=None,
            lang=None,
            publisher=None,
            position=1,
        ),
        Row(  # adversarial body: embeds a fake WARC record + bare CRLFs —
            # a length-delimited parser must sail straight past it
            url="https://news2.example.com/decoy",
            warc_ts=TS + dt.timedelta(seconds=1),
            html=(
                b"\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: 99999\r\n\r\nnot a real record\r\n\r\n"
            ),
            text="decoy",
            lang="de",
            publisher="news2",
            position=2,
        ),
        Row(  # non-utf8 binary payload
            url="https://news3.example.com/bin",
            warc_ts=TS + dt.timedelta(days=1, microseconds=999999),
            html=bytes(range(256)),
            text=None,
            lang="fr",
            publisher="news3",
            position=3,
        ),
    ]
    return spark.createDataFrame(rows, PAGES)


def _by_url(df):
    return {
        r["url"]: (r["warc_ts"], bytes(r["html"]), r["lang"], r["publisher"])
        for r in df.collect()
    }


@pytest.mark.parametrize("compress", [False, True])
def test_warc_roundtrip_exact(spark, tmp_path, compress):
    pages = _pages_df(spark)
    out = str(tmp_path / ("warc_gz" if compress else "warc"))
    manifest = write_warc(pages.repartition(2, "url"), out, compress=compress)
    assert manifest["n_records"].sum() == 4
    assert all(os.path.getsize(p) == b for p, b in zip(manifest["path"], manifest["n_bytes"]))

    back = read_warc(spark, out)
    want = _by_url(pages.select("url", "warc_ts", "html", "lang", "publisher"))
    got = _by_url(back)
    assert got == want
    # one distinct source file per partition, each row tagged with its file
    assert back.select("warc_file").distinct().count() == 2


def test_warc_reexport_byte_identical(spark, tmp_path):
    """Determinism contract: same table, same partitioning -> byte-identical
    files (uuid5 ids, column-driven dates, pinned gzip mtime)."""
    pages = _pages_df(spark).repartition(2, "url")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(pages, a, compress=True)
    write_warc(pages, b, compress=True)
    fa = sorted(glob.glob(f"{a}/*.warc.gz"))
    fb = sorted(glob.glob(f"{b}/*.warc.gz"))
    assert fa and len(fa) == len(fb)
    for pa, pb in zip(fa, fb):
        with open(pa, "rb") as f1, open(pb, "rb") as f2:
            assert f1.read() == f2.read(), pa


def test_warc_truncated_file_raises(spark, tmp_path):
    pages = _pages_df(spark).coalesce(1)
    out = str(tmp_path / "warc")
    [path] = write_warc(pages, out)["path"]
    with open(path, "rb") as f:
        raw = f.read()
    with open(path, "wb") as f:
        f.write(raw[:-10])  # chop the final record's terminator
    with pytest.raises(Exception, match="terminator|bad record"):
        read_warc(spark, out).collect()


def test_warc_export_of_crawled_catalog(spark, tmp_path):
    """End-to-end: crawl the synthetic web, export the pages table to WARC,
    read it back — url/ts/html/lang/publisher survive exactly."""
    from news_crawler_slm_spark.crawl.rounds import run_crawl, synthetic_fetcher
    from news_crawler_slm_spark.crawl.semantics import CrawlParams
    from news_crawler_slm_spark.sources.synthetic_web import WebScale, web_dataframes
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog

    params = CrawlParams(round_budget=6.0, max_articles=12, max_rounds=3)
    dfs = web_dataframes(spark, WebScale(n_hosts=6, pages_per_host_max=8, seed=3))
    root = str(tmp_path / "cat")
    run_crawl(spark, root, dfs["seeds"], dfs["robots"], synthetic_fetcher(dfs["web"]), params)
    # the crawl catalog's pages table is (url, text, lang, publisher,
    # fetch_round); the caller maps it into the canonical WARC shape —
    # fetch_round becomes a deterministic archive timestamp
    pages = (
        SnapshotCatalog(spark, root)
        .read_table("pages")
        .select(
            "url",
            F.timestamp_micros(F.col("fetch_round").cast("long") * 1_000_000).alias("warc_ts"),
            F.encode(F.col("text"), "utf-8").alias("html"),
            "lang",
            "publisher",
        )
    )
    n = pages.count()
    assert n > 0

    out = str(tmp_path / "export")
    manifest = write_warc(pages, out)
    assert manifest["n_records"].sum() == n
    back = read_warc(spark, out)
    assert _by_url(back) == _by_url(pages)


def test_warc_stream_incremental_exactly_once(spark, tmp_path):
    """Streaming WARC ingestion: segment drops become micro-batches; a
    checkpointed re-run picks up ONLY new segments (exactly-once), and the
    streamed row set equals the batch read of the same files."""
    from news_crawler_slm_spark.sources.warc import read_warc_stream
    from news_crawler_slm_spark.streaming.ingest import run_available_now

    drops = str(tmp_path / "drops")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    batch1 = _pages_df(spark).where(F.col("position") < 2).coalesce(1)
    write_warc(batch1, f"{drops}/seg-0000", compress=True)

    stream = read_warc_stream(spark, drops).drop("warc_file")
    run_available_now(stream, sink, ckpt)
    got1 = spark.read.parquet(sink)
    assert {r["url"] for r in got1.collect()} == {
        r["url"] for r in batch1.collect()
    }

    # drop a second segment; same checkpoint -> only the new file streams
    batch2 = _pages_df(spark).where(F.col("position") >= 2).coalesce(1)
    write_warc(batch2, f"{drops}/seg-0001", compress=True)
    run_available_now(read_warc_stream(spark, drops).drop("warc_file"), sink, ckpt)

    streamed = spark.read.parquet(sink)
    want = _by_url(read_warc(spark, drops))
    got = _by_url(streamed)
    assert got == want  # all four urls, each exactly once
    assert streamed.count() == 4
