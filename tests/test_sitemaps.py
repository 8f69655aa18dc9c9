"""Sitemap protocol: robots Sitemap: discovery, urlset/sitemapindex parsing
(gzip, malformed, DTD-reject, cycles), index expansion, and seeding the
frontier through the existing frontier_from_seeds insert path."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from news_crawler_slm_spark.crawl.frontier import frontier_from_seeds
from news_crawler_slm_spark.crawl.semantics import CrawlParams
from news_crawler_slm_spark.crawl.sitemaps import (
    parse_sitemap,
    resolve_sitemaps,
    sitemap_entries,
    sitemap_seeds,
    sitemap_urls_from_robots,
)
from news_crawler_slm_spark.sources.synthetic_web import WebScale, generate_web

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'


def _urlset(entries: list[tuple[str, str | None, float | None]]) -> str:
    rows = []
    for loc, lastmod, prio in entries:
        r = f"<url><loc>{loc}</loc>"
        if lastmod:
            r += f"<lastmod>{lastmod}</lastmod>"
        if prio is not None:
            r += f"<priority>{prio}</priority>"
        rows.append(r + "</url>")
    return f'<?xml version="1.0"?><urlset {NS}>' + "".join(rows) + "</urlset>"


def _index(children: list[str]) -> str:
    rows = "".join(f"<sitemap><loc>{c}</loc></sitemap>" for c in children)
    return f'<?xml version="1.0"?><sitemapindex {NS}>' + rows + "</sitemapindex>"


# ------------------------------------------------------------ pure function


def test_parse_urlset_fields_and_bounds():
    xml = _urlset(
        [
            ("https://h/p0", "2026-01-02", 1.0),
            ("https://h/p1", None, 0.3),
            ("https://h/p2", None, None),
            ("https://h/p3", None, 7.5),  # out-of-range priority -> None
            ("ftp://h/p4", None, 0.5),  # non-http loc dropped
        ]
    )
    got = parse_sitemap(xml)
    assert [(e.loc, e.lastmod, e.priority, e.kind) for e in got] == [
        ("https://h/p0", "2026-01-02", 1.0, "url"),
        ("https://h/p1", None, 0.3, "url"),
        ("https://h/p2", None, None, "url"),
        ("https://h/p3", None, None, "url"),
    ]


def test_parse_sitemapindex_and_namespace_tolerance():
    got = parse_sitemap(_index(["https://h/a.xml", "https://h/b.xml"]))
    assert [(e.loc, e.kind) for e in got] == [
        ("https://h/a.xml", "sitemap"),
        ("https://h/b.xml", "sitemap"),
    ]
    # no namespace at all — common in the wild
    bare = "<urlset><url><loc>https://h/p0</loc></url></urlset>"
    assert [e.loc for e in parse_sitemap(bare)] == ["https://h/p0"]


def test_parse_hostile_inputs_degrade_to_empty():
    assert parse_sitemap(None) == []
    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset><url><loc>https://h/p") == []  # truncated
    assert parse_sitemap("<html><body>404</body></html>") == []  # wrong root
    dtd = '<?xml version="1.0"?><!DOCTYPE urlset [<!ENTITY a "b">]>' + _urlset(
        [("https://h/p0", None, None)]
    ).split("?>", 1)[1]
    assert parse_sitemap(dtd) == []  # DTD rejected outright
    # gzip round-trip works; corrupt gzip degrades
    xml = _urlset([("https://h/p0", None, 0.9)])
    assert [e.loc for e in parse_sitemap(gzip.compress(xml.encode()))] == [
        "https://h/p0"
    ]
    assert parse_sitemap(b"\x1f\x8b" + b"junk") == []


def test_sitemap_urls_from_robots():
    text = (
        "User-agent: *\nDisallow: /private\n"
        "Sitemap: https://h/sitemap.xml  # comment\n"
        "sitemap: https://h/other.xml\n"
        "Sitemap: not-a-url\n"
    )
    assert sitemap_urls_from_robots(text) == [
        "https://h/sitemap.xml",
        "https://h/other.xml",
    ]


# ------------------------------------------------------- distributed layer


def _sitemap_corpus(spark, scale: WebScale):
    """Per-host sitemap docs over the synthetic web: host 0 behind a
    two-child sitemapindex (one child gzipped), a self-cycling index on
    host 1, plain urlsets elsewhere; p0 carries priority 1.0, the rest
    0.5 implicitly (absent)."""
    rows = generate_web(scale)
    by_host: dict[str, list[str]] = {}
    for url, *_ in rows["web"]:
        host = url.split("/")[2]
        by_host.setdefault(host, []).append(url)

    docs: list[tuple[str, bytes]] = []
    roots: list[str] = []
    for host, urls in sorted(by_host.items()):
        root = f"https://{host}/sitemap.xml"
        roots.append(root)
        entries = [(u, None, 1.0 if u.endswith("/p0") else None) for u in urls]
        if host.startswith("news0."):
            half = len(entries) // 2
            a, b = f"https://{host}/sm_a.xml", f"https://{host}/sm_b.xml.gz"
            docs.append((root, _index([a, b]).encode()))
            docs.append((a, _urlset(entries[:half]).encode()))
            docs.append((b, gzip.compress(_urlset(entries[half:]).encode())))
        elif host.startswith("news1."):
            # index that names itself AND the real urlset: must terminate
            real = f"https://{host}/sm_real.xml"
            docs.append((root, _index([root, real]).encode()))
            docs.append((real, _urlset(entries).encode()))
        else:
            docs.append((root, _urlset(entries).encode()))
    bodies = spark.createDataFrame(docs, "url string, body binary")
    roots_df = spark.createDataFrame([(r,) for r in roots], "url string")
    return rows, by_host, bodies, roots_df


def test_resolve_sitemaps_covers_corpus_and_terminates_on_cycles(spark):
    scale = WebScale(n_hosts=5, pages_per_host_max=12)
    _, by_host, bodies, roots = _sitemap_corpus(spark, scale)
    got = resolve_sitemaps(bodies, roots).collect()
    want = {u for urls in by_host.values() for u in urls}
    assert {r["loc"] for r in got} == want
    assert len(got) == len(want)  # no duplicate emission across levels
    prios = {r["loc"]: r["priority"] for r in got}
    for u in want:
        assert prios[u] == (1.0 if u.endswith("/p0") else None)


def test_sitemap_entries_is_the_arrow_twin_of_parse(spark):
    scale = WebScale(n_hosts=3, pages_per_host_max=6)
    _, _, bodies, _ = _sitemap_corpus(spark, scale)
    got = sitemap_entries(bodies).collect()
    from news_crawler_slm_spark.crawl.sitemaps import parse_sitemap as pp

    want = []
    for r in bodies.collect():
        for e in pp(bytes(r["body"])):
            want.append((r["url"], e.loc, e.lastmod, e.priority, e.kind))
    assert sorted((r["src"], r["loc"], r["lastmod"], r["priority"], r["kind"]) for r in got) == sorted(want)


def test_sitemap_seeds_feed_frontier_with_robots_gate(spark):
    scale = WebScale(n_hosts=5, pages_per_host_max=12)
    rows, by_host, bodies, roots = _sitemap_corpus(spark, scale)
    entries = resolve_sitemaps(bodies, roots)
    host_meta = spark.createDataFrame(
        [(h, p, r, d) for _, h, p, r, d, _ in rows["seeds"]],
        "host string, publisher string, publisher_rank int, deprecated boolean",
    )
    seeds = sitemap_seeds(entries, host_meta)
    robots = spark.createDataFrame(
        rows["robots"],
        "host string, disallow array<string>, allow array<string>, crawl_delay double",
    )
    params = CrawlParams(n_buckets=4, n_salts=2)
    frontier = frontier_from_seeds(seeds, robots, params)
    got = {r["url"]: r["priority"] for r in frontier.collect()}

    # sequential twin: deprecated hosts out, robots prefixes enforced,
    # default priority 0.5, p0 keeps its explicit 1.0
    deprecated_hosts = {h for _, h, _, _, d, _ in rows["seeds"] if d}
    robots_map = {h: (dis, allow) for h, dis, allow, _ in rows["robots"]}
    want = {}
    for host, urls in by_host.items():
        if host in deprecated_hosts:
            continue
        dis, allow = robots_map[host]
        for u in urls:
            path = "/" + u.split("/", 3)[3]
            d_len = max((len(p) for p in dis if path.startswith(p)), default=-1)
            a_len = max((len(p) for p in allow if path.startswith(p)), default=-1)
            if d_len > a_len:
                continue
            want[u] = 1.0 if u.endswith("/p0") else 0.5
    assert got == want
