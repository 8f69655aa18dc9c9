"""Explicit schemas for every engine table.

The reference never declares a schema anywhere — its record shape exists only
as a dict literal (/root/reference/data_extraction/crawl_articles.py:14-21)
and whatever HF ``Dataset.from_dict`` infers
(/root/reference/data_ops/step_01_convert_to_hf_dataset.py:28); its own upload
code must re-align diverging inferred features
(/root/reference/data_extraction/upload_dataset.py:17-20). This engine pins
every schema explicitly; scans always pass one of these (schema inference at
100 TB is both slow and a correctness hazard).

Canonical input table per BASELINE.json ``input_hint``:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``
plus ``publisher`` (1:1 with host) and ``position`` (stable row ordinal — the
distributed replacement for the reference's enumerate index,
step_04_get_token_statistics.py:41-42).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- pages
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("position", T.LongType(), True),
    ]
)

# ---------------------------------------------------------------- crawl state
SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("publisher_rank", T.IntegerType(), True),
        T.StructField("deprecated", T.BooleanType(), True),
        T.StructField("priority", T.DoubleType(), True),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),  # pmod(xxhash64(host), B)
        T.StructField("salt", T.IntegerType(), False),  # pmod(xxhash64(url), S) for hot hosts
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),  # xxhash64(canonical url)
        T.StructField("priority", T.DoubleType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("discovered_round", T.IntegerType(), False),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("allow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
    ]
)

WEB = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("out_links", T.ArrayType(T.StringType()), True),
        T.StructField("fetch_ok", T.BooleanType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("publisher", T.StringType(), True),
    ]
)

# WEB plus the optional redirect channel: a 3xx row carries fetch_ok=true,
# html/out_links null, and redirect_to = the Location target. Fetchers
# propagate the column when the web table declares it; the crawl round
# logs such rows "redirected" and re-enqueues the target through the
# normal discovery pipeline (crawl/rounds.py).
WEB_REDIRECTS = T.StructType(
    WEB.fields + [T.StructField("redirect_to", T.StringType(), True)]
)

CRAWL_LOG = T.StructType(
    [
        T.StructField("round", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),  # global deterministic order within round
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # fetched | failed
    ]
)

# ---------------------------------------------------------------- side tables
# Replaces the reference's token-stats *text file* side channel
# (step_04:57-66, regex-reparsed by step_05:30 and two other consumers).
TOKEN_STATS = T.StructType(
    [
        T.StructField("split", T.StringType(), False),
        T.StructField("position", T.LongType(), False),
        T.StructField("column_name", T.StringType(), False),
        T.StructField("token_count", T.LongType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)
