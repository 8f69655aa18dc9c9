"""Deterministic synthetic web corpus (FIXTURES.md §1-4).

Pure function of (seed, size parameters) — byte-identical across runs and
parallelism levels, which the determinism tests rely on. No external data,
no network. Host popularity is Zipf-skewed so one or two hosts are "hot"
(exercises salting / skew handling), and the HTML generator hits every
``clean_html`` branch (removed tags, ld+json scripts, ad class/id substrings
incl. ``radar``, inline styles, comments, unicode, malformed markup).

Reference analog: the live Fundus publisher collection + web
(crawl_articles.py:33, 87-98) — replaced by an offline deterministic graph
so crawl ordering and the seen set are exactly reproducible.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .. import schemas

LANGS = ("en", "de", "fr", "es", "it")

_REMOVABLE_SNIPPETS = [
    '<link rel="stylesheet" href="/s.css">',
    "<style>body {{ color: red }}</style>",
    '<svg viewBox="0 0 1 1"><circle r="1"/></svg>',
    '<a href="/somewhere">anchor text {i}</a>',
    "<nav><ul><li>home</li></ul></nav>",
    '<img src="/i{i}.png" alt="pic">',
    "<figure><figcaption>cap {i}</figcaption></figure>",
    "<ins>inserted {i}</ins>",
    '<iframe src="/frame"></iframe>',
    "<tickaroo-liveblog data-x=\"1\">live</tickaroo-liveblog>",
    "<astro-island uid=\"a{i}\">island</astro-island>",
    '<script>console.log("js {i}")</script>',
    '<script type="text/javascript">var x={i};</script>',
    '<div class="advertisement">buy now</div>',
    '<div class="radar">substring-ad-match {i}</div>',
    '<section id="sponsored-block">sp {i}</section>',
    '<div id="ad-slot-{i}">slot</div>',
]

_KEPT_SNIPPETS = [
    '<script type="application/ld+json">{{"@type": "Article", "n": {i}}}</script>',
    '<p style="margin: 0">styled paragraph {i}</p>',
    "<p>plain paragraph {i} with unicode éüß — emoji \U0001f600</p>",
    "<!-- comment with <img src='x{i}.png'> inside and residual text -->",
    "<!-- <a href='/gone'>only removable</a> -->",
    "<!-- plain note {i} -->",
    "<blockquote><p>nested <em>deep</em> quote {i}</p></blockquote>",
    "<p>unclosed paragraph {i}",
]

_WORDS = {
    "en": "the quick brown fox jumps over the lazy dog and that is news of the day",
    "de": "der schnelle braune fuchs springt und die zeitung ist nicht das ende",
    "fr": "le renard brun rapide saute et la presse est une histoire les jours",
    "es": "el zorro marrón salta y los periódicos que una noticia es grande",
    "it": "il volpe marrone salta che di giornale e una notizia per il giorno",
}


@dataclass(frozen=True)
class WebScale:
    n_hosts: int = 20
    pages_per_host_max: int = 60  # host h gets ~max/(rank+1) pages (Zipf)
    links_per_page: int = 4
    seed: int = 42


def _page_html(rng: random.Random, host: str, page_idx: int, lang: str) -> str:
    """Synthetic article HTML mixing kept + removable elements."""
    i = page_idx
    body: list[str] = [f"<h1>Article {i} from {host}</h1>"]
    words = _WORDS[lang].split()
    n_snip = 3 + rng.randrange(5)
    for _ in range(n_snip):
        if rng.random() < 0.5:
            body.append(rng.choice(_REMOVABLE_SNIPPETS).format(i=i))
        else:
            body.append(rng.choice(_KEPT_SNIPPETS).format(i=i))
        sent = " ".join(rng.choice(words) for _ in range(8 + rng.randrange(12)))
        body.append(f"<p>{sent}.</p>")
    return (
        "<!DOCTYPE html>\n<html>\n<head>\n"
        f"<title>{host} {i}</title>\n"
        '<link rel="icon" href="/f.ico">\n'
        "</head>\n<body>\n" + "\n".join(body) + "\n</body>\n</html>"
    )


def generate_web(scale: WebScale = WebScale()) -> dict[str, list]:
    """Build the full corpus as python rows: web, seeds, robots.

    Deterministic: a single Random(seed) consumed in a fixed order.
    """
    rng = random.Random(scale.seed)
    hosts = [f"news{h}.example.com" for h in range(scale.n_hosts)]
    publishers = [f"Publisher{h}" for h in range(scale.n_hosts)]

    # Zipf page counts: hot host 0 gets the max, tail hosts get few.
    page_counts = [
        max(3, int(scale.pages_per_host_max / (h + 1) ** 0.7)) for h in range(scale.n_hosts)
    ]
    host_lang = {h: LANGS[h % len(LANGS)] for h in range(scale.n_hosts)}

    all_urls: list[list[str]] = [
        [f"https://{hosts[h]}/p{i}" for i in range(page_counts[h])]
        for h in range(scale.n_hosts)
    ]
    flat_urls = [u for us in all_urls for u in us]

    web_rows = []
    for h in range(scale.n_hosts):
        for i, url in enumerate(all_urls[h]):
            lang = host_lang[h]
            html = _page_html(rng, hosts[h], i, lang)
            # out-links: mostly same host (next pages), some cross-host,
            # deliberate duplicates + already-seen for dedup tests
            links: list[str] = []
            for _ in range(scale.links_per_page):
                if rng.random() < 0.7:
                    links.append(all_urls[h][rng.randrange(len(all_urls[h]))])
                else:
                    links.append(flat_urls[rng.randrange(len(flat_urls))])
            if links and rng.random() < 0.3:
                links.append(links[0])  # duplicate
            fetch_ok = rng.random() > 0.05
            web_rows.append((url, html.encode("utf-8"), links, fetch_ok, lang, publishers[h]))

    seed_rows = []
    for h in range(scale.n_hosts):
        deprecated = (h % 7 == 3)  # a few deprecated publishers (P3 filter)
        seed_rows.append(
            (all_urls[h][0], hosts[h], publishers[h], h + 1, deprecated, float(scale.n_hosts - h))
        )

    robots_rows = []
    for h in range(scale.n_hosts):
        disallow = ["/private"] + (["/p1"] if h % 5 == 0 else [])
        # longest-match Allow carve-out: /p1 is disallowed on h%5==0 hosts
        # (which also blocks /p10, /p11, ... by prefix) but /p12 is allowed
        # back — exercises RFC 9309 precedence in the live crawl tests
        allow = ["/p12"] if h % 10 == 0 else []
        # one high-delay host for politeness-budget tests
        delay = 30.0 if h == 1 else float(1 + (h % 3))
        robots_rows.append((hosts[h], disallow, allow, delay))

    return {"web": web_rows, "seeds": seed_rows, "robots": robots_rows}


def web_dataframes(spark: SparkSession, scale: WebScale = WebScale()) -> dict[str, DataFrame]:
    rows = generate_web(scale)
    return {
        "web": spark.createDataFrame(rows["web"], schemas.WEB),
        "seeds": spark.createDataFrame(rows["seeds"], schemas.SEEDS),
        "robots": spark.createDataFrame(rows["robots"], schemas.ROBOTS),
    }


# ------------------------------------------------------------- bench corpus
#
# The functional corpus above is generated driver-side (small, exhaustive
# branch coverage). The BENCH corpus must be big enough that the Arrow
# extract chain dominates per-round overhead, so HTML is synthesized on the
# EXECUTORS by a deterministic pandas UDF — the same pattern a 100 TB corpus
# uses (driver holds only metadata; heavy columns never pass through the
# driver).


def _bench_page_html(seed: int, host: str, page_idx: int, lang: str, body_paras: int) -> bytes:
    """Pure function of (seed, host, page_idx): safe to evaluate on any
    executor in any order."""
    rng = random.Random(f"{seed}:{host}:{page_idx}")
    base = _page_html(rng, host, page_idx, lang)
    words = _WORDS[lang].split()
    fill: list[str] = []
    for p in range(body_paras):
        sent = " ".join(rng.choice(words) for _ in range(12))
        if p % 3 == 0:
            fill.append(rng.choice(_REMOVABLE_SNIPPETS).format(i=p))
        elif p % 3 == 1:
            fill.append(rng.choice(_KEPT_SNIPPETS).format(i=p))
        fill.append(f'<p style="margin:{p}px">{sent} filler {p}.</p>')
    return base.replace("</body>", "\n".join(fill) + "\n</body>").encode("utf-8")


def bench_web_dataframes(
    spark: SparkSession,
    n_hosts: int = 64,
    pages_per_host: int = 96,
    body_paras: int = 220,
    seed: int = 7,
    partitions: int = 64,
) -> dict[str, DataFrame]:
    """Deterministic crawl-bench corpus: uniform hosts (balanced rounds),
    every page links to all pages of its host (round 2 pops the full host
    under a pages_per_host budget), HTML ≈ body_paras paragraphs generated
    executor-side."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    hosts = [f"bench{h}.example.com" for h in range(n_hosts)]
    meta_rows = []
    for h in range(n_hosts):
        lang = LANGS[h % len(LANGS)]
        urls = [f"https://{hosts[h]}/p{i}" for i in range(pages_per_host)]
        cross = f"https://{hosts[(h + 1) % n_hosts]}/p0"
        for i, url in enumerate(urls):
            # seed page links the whole host (round 2 pops everything under a
            # pages_per_host budget); interior pages carry a realistic ~8-link
            # neighborhood so discovery volume stays O(pages), not O(pages²)
            if i == 0:
                links = urls[1:] + [cross]
            else:
                links = [urls[(i + j) % pages_per_host] for j in range(1, 9)] + [cross]
            meta_rows.append((url, hosts[h], i, links, True, lang, f"Bench{h}"))

    meta = spark.createDataFrame(
        meta_rows, "url string, host string, page_idx int, out_links array<string>, "
        "fetch_ok boolean, lang string, publisher string"
    ).repartition(partitions, "url")

    @F.pandas_udf(BinaryType())
    def gen_html(host: pd.Series, page_idx: pd.Series, lang: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _bench_page_html(seed, h, int(i), la, body_paras)
                for h, i, la in zip(host, page_idx, lang)
            ]
        )

    web = meta.select(
        "url",
        gen_html("host", "page_idx", "lang").alias("html"),
        "out_links",
        "fetch_ok",
        "lang",
        "publisher",
    )
    seed_rows = [
        (f"https://{hosts[h]}/p0", hosts[h], f"Bench{h}", h + 1, False, float(n_hosts - h))
        for h in range(n_hosts)
    ]
    robots_rows = [(hosts[h], ["/private"], [], 1.0) for h in range(n_hosts)]
    return {
        "web": web,
        "seeds": spark.createDataFrame(seed_rows, schemas.SEEDS),
        "robots": spark.createDataFrame(robots_rows, schemas.ROBOTS),
    }
