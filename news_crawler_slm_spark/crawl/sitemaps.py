"""Sitemap protocol (sitemaps.org) ingestion: robots.txt ``Sitemap:``
discovery -> sitemap / sitemap-index parsing -> SEEDS-shaped frontier rows.

The reference's crawl surface delegates URL discovery entirely to Fundus
publishers (crawl_articles.py); a from-scratch frontier needs the standard
discovery channel real crawlers use — the sitemap protocol: robots.txt
names sitemap documents, each either a ``<urlset>`` of page URLs (with
optional lastmod / priority hints) or a ``<sitemapindex>`` naming child
sitemaps, nested up to a small depth.

Shape at 10^10-URL scale: sitemap documents are fetched like any other URL
(they land in a (url, body) table via the same fetch slots); parsing is a
single Arrow-batched ``mapInPandas`` pass per nesting level, and index
expansion is a driver-side loop over LEVELS (bounded, ~3 in the wild — the
loop state is which *level* we're on, never data). Entries join
``frontier_from_seeds`` unchanged — canonicalization, robots gating, and
max-priority dedup are the frontier's existing insert path.

Untrusted input discipline: bodies are attacker-controlled XML. Documents
carrying a DTD (``<!DOCTYPE``) are rejected outright (entity-expansion
class), parse errors yield zero entries, gzip output is capped at
_GZIP_CAP per document (zip-bomb class), and only http(s) locs under a
sane length are kept. Pure functions here; the distributed wrappers map
them over Arrow batches — the same sequential ≡ distributed split as
robots.py.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GZIP_CAP = 64 * 1024 * 1024  # max decompressed bytes per sitemap document
_MAX_LOC_LEN = 2048  # sitemaps.org: <loc> must be < 2048 chars
_MAX_LEVELS = 3  # index -> index -> urlset; deeper nesting is ignored

SITEMAP_ENTRY_SCHEMA = (
    "src string, loc string, lastmod string, priority double, kind string"
)


@dataclass(frozen=True)
class SitemapEntry:
    loc: str
    lastmod: str | None
    priority: float | None
    kind: str  # "url" (page) | "sitemap" (child sitemap document)


def sitemap_urls_from_robots(text: str) -> list[str]:
    """``Sitemap:`` lines from robots.txt (RFC 9309 §2.3: group-independent,
    may appear anywhere; the value is an absolute URL). parse_robots
    deliberately skips them — rule-group parsing is orthogonal."""
    out: list[str] = []
    for raw in text.lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        key, sep, value = line.partition(":")
        if sep and key.strip().lower() == "sitemap":
            url = value.strip()
            if url.startswith(("http://", "https://")) and len(url) <= _MAX_LOC_LEN:
                out.append(url)
    return out


def _decode_body(body: bytes | str | None) -> str | None:
    if body is None:
        return None
    if isinstance(body, str):
        return body
    data = bytes(body)
    if data[:2] == b"\x1f\x8b":  # gzip magic — .xml.gz sitemaps
        try:
            with gzip.GzipFile(fileobj=io.BytesIO(data)) as gz:
                data = gz.read(_GZIP_CAP + 1)
            if len(data) > _GZIP_CAP:
                return None  # zip-bomb cap: reject rather than truncate
        except (OSError, EOFError):  # truncated/corrupt gzip
            return None
    return data.decode("utf-8", errors="replace")


def _local(tag: str) -> str:
    """Element tag without its namespace — accepts the canonical sitemap
    namespace, none, or any other (real-world sitemaps get this wrong)."""
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(body: bytes | str | None) -> list[SitemapEntry]:
    """Parse one sitemap document; total and deterministic: anything
    malformed (bad XML, DTD present, non-http locs, out-of-range priority)
    degrades to fewer entries, never an exception."""
    text = _decode_body(body)
    if text is None:
        return []
    head = text[:512].lstrip().lower()
    if "<!doctype" in head:
        return []  # DTD/entity expansion class: reject untrusted DTDs
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return []
    root_tag = _local(root.tag)
    if root_tag not in ("urlset", "sitemapindex"):
        return []
    kind = "url" if root_tag == "urlset" else "sitemap"
    entries: list[SitemapEntry] = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        loc = lastmod = prio_raw = None
        for field in child:
            name = _local(field.tag)
            value = (field.text or "").strip()
            if name == "loc":
                loc = value
            elif name == "lastmod":
                lastmod = value or None
            elif name == "priority":
                prio_raw = value
        if not loc or len(loc) > _MAX_LOC_LEN:
            continue
        if not loc.startswith(("http://", "https://")):
            continue
        priority: float | None = None
        if kind == "url" and prio_raw is not None:
            try:
                p = float(prio_raw)
            except ValueError:
                p = None
            if p is not None and 0.0 <= p <= 1.0:
                priority = p
        entries.append(
            SitemapEntry(loc=loc, lastmod=lastmod, priority=priority, kind=kind)
        )
    return entries


def sitemap_entries(docs: DataFrame) -> DataFrame:
    """docs(url string, body binary|string) -> one row per entry:
    (src, loc, lastmod, priority, kind) — the Arrow-batched distributed
    twin of parse_sitemap."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            src, loc, lastmod, prio, kind = [], [], [], [], []
            for u, body in zip(pdf["url"], pdf["body"]):
                for e in parse_sitemap(body):
                    src.append(u)
                    loc.append(e.loc)
                    lastmod.append(e.lastmod)
                    prio.append(e.priority)
                    kind.append(e.kind)
            yield pd.DataFrame(
                {
                    "src": src,
                    "loc": loc,
                    "lastmod": pd.Series(lastmod, dtype="object"),
                    "priority": pd.Series(prio, dtype="float64"),
                    "kind": pd.Series(kind, dtype="object"),
                }
            )

    return docs.select("url", "body").mapInPandas(run, SITEMAP_ENTRY_SCHEMA)


def resolve_sitemaps(
    bodies: DataFrame, roots: DataFrame, max_levels: int = _MAX_LEVELS
) -> DataFrame:
    """Expand sitemap indexes breadth-first and return all page-URL entries.

    bodies(url, body): every fetched sitemap document (the fetch slot's
    output table). roots(url): the documents named by robots.txt. One
    mapInPandas parse per nesting LEVEL (the driver loop iterates levels,
    max_levels of them, never rows); each level's ``sitemap``-kind locs
    become the next level's frontier, anti-joined against already-parsed
    documents so cyclic indexes terminate. Returns (src, loc, lastmod,
    priority) for kind='url' entries only.
    """
    frontier = roots.select("url").distinct()
    seen = frontier
    out: DataFrame | None = None
    for _ in range(max_levels):
        docs = bodies.join(frontier, "url", "left_semi")
        entries = sitemap_entries(docs)
        urls = entries.where(F.col("kind") == "url").select(
            "src", "loc", "lastmod", "priority"
        )
        out = urls if out is None else out.unionByName(urls)
        nxt = (
            entries.where(F.col("kind") == "sitemap")
            .select(F.col("loc").alias("url"))
            .distinct()
            .join(seen, "url", "left_anti")
        )
        frontier = nxt
        seen = seen.unionByName(frontier).distinct()
    assert out is not None
    return out


def sitemap_seeds(url_entries: DataFrame, host_meta: DataFrame | None = None) -> DataFrame:
    """Page-URL entries -> SEEDS-shaped rows for frontier_from_seeds.

    Priority defaults to the protocol's 0.5 when absent. host_meta
    (host, publisher, publisher_rank, deprecated) — normally the seed
    list — resolves publishers by host (broadcast join, same pattern as
    ccnews publisher resolution); unmatched hosts carry null publisher
    and deprecated=false. Canonicalization, robots gating, and
    max-priority dedup all happen inside frontier_from_seeds — this
    function only shapes rows.
    """
    s = url_entries.select(
        F.col("loc").alias("url"),
        F.regexp_extract(F.col("loc"), r"^https?://([^/]+)", 1).alias("host"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("priority"),
    )
    if host_meta is not None:
        s = s.join(
            F.broadcast(
                host_meta.select(
                    "host", "publisher", "publisher_rank", "deprecated"
                ).distinct()
            ),
            "host",
            "left",
        )
    else:
        s = (
            s.withColumn("publisher", F.lit(None).cast("string"))
            .withColumn("publisher_rank", F.lit(None).cast("int"))
            .withColumn("deprecated", F.lit(None).cast("boolean"))
        )
    return s.select(
        "url",
        "host",
        "publisher",
        F.col("publisher_rank").cast("int").alias("publisher_rank"),
        F.coalesce(F.col("deprecated"), F.lit(False)).alias("deprecated"),
        F.col("priority").cast("double").alias("priority"),
    )
