"""CC-News-style archive ingestion — the reference's second crawler
backend, Spark-native.

The reference picks between two Fundus crawlers per run
(crawl_articles.py:87-90): ``Crawler(publisher)`` fetches the live web,
``CCNewsCrawler(publisher)`` streams Common Crawl's CC-NEWS WARC archives
and yields the same per-publisher article stream (config flag
``use_cc_news_crawler``, config.json:5-6). This module is that second
backend for this engine: ingest a directory of WARC segments
(sources/warc.py — the same format Common Crawl publishes), resolve each
record to a configured publisher, apply the SAME per-publisher
``max_articles`` cap and deprecated-publisher skip as the live crawl,
run the clean_html extraction chain, and emit the canonical pages shape.

Differences from the live path are exactly the reference's: no frontier,
no robots/politeness (the archive was already fetched politely by the
archive's crawler), no link discovery — the archive IS the frontier.

Determinism: the per-publisher cap keeps the FIRST ``max_articles``
records by (warc_ts, url) — archive order, ties broken by url — so the
same segments always select the same articles (the reference inherits
whatever order Fundus yields; a distributed engine must pin one).

Scale shape: WARC segments scan at one task per file with no shuffle
(sources/warc.py); publisher resolution is a broadcast join against the
seed list (tiny by construction — it is the reference's
PublisherCollection); the cap is one window per publisher (the same W2
top-k discipline as the live crawl's per-host budget); ``position`` uses
the range-partitioned distributed rank (operators/rank.py) — no
SinglePartition funnel. Everything downstream (dedup, quality, packing)
is corpus-source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..functions.udfs import clean_html_udf
from ..operators.rank import with_global_rank
from ..sources.warc import read_warc
from .semantics import CrawlParams


def ccnews_ingest(
    spark: SparkSession,
    warc_path: str,
    seeds: DataFrame,
    params: CrawlParams = CrawlParams(),
) -> DataFrame:
    """Ingest WARC segments under ``warc_path`` into the canonical pages
    shape (url, warc_ts, html, text, lang, publisher, position).

    - records resolve to a publisher via the record's own publisher
      header when present, else by host against ``seeds`` (broadcast);
      records matching no configured publisher are dropped (the reference
      only crawls PublisherCollection members);
    - deprecated publishers are skipped (crawl_articles.py:53-55);
    - per publisher, the first ``params.max_articles`` records by
      (warc_ts, url) are kept (crawl_articles.py:92 ``max_articles``);
    - duplicate urls within the archive keep the earliest record (archives
      carry re-fetches; the live path's url-seen store never fetches a
      url twice, so the cap must not count duplicates either);
    - ``text`` is the clean_html extraction chain — byte-identical to the
      live crawl's extraction (golden tests share the corpus);
    - ``position`` is the stable global ordinal over (publisher, warc_ts,
      url) via the distributed rank.
    """
    recs = read_warc(spark, warc_path)

    pubmap = (
        seeds.select("host", F.col("publisher").alias("seed_publisher"), "deprecated")
        .where(F.col("publisher").isNotNull())
        .distinct()
    )
    resolved = (
        recs.withColumn("host", U.host_of(F.col("url")))
        .join(F.broadcast(pubmap), "host", "left")
        .withColumn("publisher", F.coalesce(F.col("publisher"), F.col("seed_publisher")))
        .where(F.col("publisher").isNotNull())
        .where(~F.coalesce(F.col("deprecated"), F.lit(False)))
    )

    # earliest record per url, then first max_articles per publisher —
    # both deterministic, both plain windows (per-url groups are tiny;
    # per-publisher groups are bounded by archive volume per outlet)
    w_url = Window.partitionBy("url").orderBy("warc_ts", "record_id")
    w_pub = Window.partitionBy("publisher").orderBy("warc_ts", "url")
    capped = (
        resolved.withColumn("__u", F.row_number().over(w_url))
        .where(F.col("__u") == 1)
        .withColumn("__r", F.row_number().over(w_pub))
        .where(F.col("__r") <= params.max_articles)
        .select("url", "warc_ts", "html", "lang", "publisher")
    )

    extracted = capped.withColumn("text", clean_html_udf(F.col("html")))
    ranked = with_global_rank(
        extracted,
        order=[F.col("publisher"), F.col("warc_ts"), F.col("url")],
        out_col="position",
    )
    return ranked.select(
        "url", "warc_ts", "html", "text", "lang", "publisher", "position"
    )
