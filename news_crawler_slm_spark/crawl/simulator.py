"""Sequential reference-semantics crawl simulator — the test oracle.

Plain-Python reimplementation of the crawl loop semantics
(/root/reference/data_extraction/crawl_articles.py:45-118: ordered source
iteration, deprecated skip, finished-set skip, per-source article cap,
append-per-article, completion checkpoint), made deterministic per
``crawl/semantics.py``. The distributed engine must produce an identical
crawl log, seen set, and page set (north rule: "matching the reference's
crawl ordering and URL-seen set under the same seed list + politeness
budget"). Never import engine (Spark) code here — this must stay an
independent oracle.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..functions.html_clean import clean_html
from .semantics import (
    CrawlParams,
    canonical_url,
    child_priority,
    host_budget,
    host_of,
    is_disallowed,
    is_fetchable,
)


@dataclass
class SimResult:
    crawl_log: list[tuple[int, int, str, str, str]] = field(default_factory=list)
    seen: set[str] = field(default_factory=set)
    pages: dict[str, tuple[str, str, str]] = field(default_factory=dict)  # url -> (text, lang, publisher)
    frontier: dict[str, tuple[str, float, int, int]] = field(default_factory=dict)
    # url -> (host, priority, depth, discovered_round)
    rounds_run: int = 0
    # (round, source_url, canonical target_url) per redirect observed —
    # recorded for every 3xx regardless of later robots/seen gating
    aliases: set[tuple[int, str, str]] = field(default_factory=set)


def simulate(
    seeds: list[tuple],  # (url, host, publisher, publisher_rank, deprecated, priority)
    robots: list[tuple],  # (host, disallow, allow, crawl_delay)
    web: list[tuple],  # (url, html_bytes, out_links, fetch_ok, lang, publisher)
    params: CrawlParams = CrawlParams(),
) -> SimResult:
    robots_by_host = {h: (list(d or []), list(a or []), cd) for h, d, a, cd in robots}
    # web rows may carry an optional 7th element `redirect_to` (the 3xx
    # Location analog); 6-tuple rows behave exactly as before
    web_by_url = {
        canonical_url(row[0]): (
            row[1],
            row[2] or [],
            row[3],
            row[4],
            row[5],
            row[6] if len(row) > 6 else None,
        )
        for row in web
    }

    res = SimResult()
    fetched_per_host: dict[str, int] = {}

    # ---- frontier init (deprecated skip = P3; robots gate at insert)
    for url, host, _pub, _rank, deprecated, priority in seeds:
        if deprecated:
            continue
        cu = canonical_url(url)
        if not is_fetchable(cu):
            continue
        h = host_of(cu)
        dis, allow, _cd = robots_by_host.get(h, (None, None, None))
        if is_disallowed(cu, dis, allow):
            continue
        if cu not in res.frontier or priority > res.frontier[cu][1]:
            res.frontier[cu] = (h, float(priority), 0, 0)

    # ---- rounds
    for rnd in range(1, params.max_rounds + 1):
        # pop per host under politeness budget
        by_host: dict[str, list[tuple[str, float, int, int]]] = {}
        for url, (h, pr, dep, dr) in res.frontier.items():
            by_host.setdefault(h, []).append((url, pr, dep, dr))

        popped: list[tuple[str, str, float, int]] = []  # (url, host, priority, depth)
        for h, items in by_host.items():
            _dis, _allow, cd = robots_by_host.get(h, (None, None, None))
            rem = params.max_articles - fetched_per_host.get(h, 0)
            b = host_budget(cd, params.round_budget, rem)
            if b <= 0:
                continue
            items.sort(key=lambda t: (-t[1], t[3], t[0]))  # priority DESC, round ASC, url ASC
            for url, pr, dep, _dr in items[:b]:
                popped.append((url, h, pr, dep))

        if not popped:
            break
        res.rounds_run = rnd

        # global deterministic fetch order
        popped.sort(key=lambda t: (-t[2], t[1], t[0]))

        discovered: dict[str, tuple[str, float, int]] = {}  # url -> (host, prio, depth)
        for seq, (url, h, pr, dep) in enumerate(popped):
            res.seen.add(url)
            del res.frontier[url]
            hit = web_by_url.get(url)
            if hit is None or not hit[2]:
                res.crawl_log.append((rnd, seq, h, url, "failed"))
                continue
            html, links, _ok, lang, pub, redirect_to = hit
            if redirect_to is not None:
                # 3xx: no body, no article-budget charge; the target joins
                # discovery at the SOURCE's priority and depth (a redirect
                # is the same document at a new address). Loops terminate
                # via the seen set.
                res.crawl_log.append((rnd, seq, h, url, "redirected"))
                cu2 = canonical_url(redirect_to)
                res.aliases.add((rnd, url, cu2))
                if is_fetchable(cu2):
                    ch2 = host_of(cu2)
                    dis2, allow2, _cd2 = robots_by_host.get(ch2, (None, None, None))
                    if (
                        not is_disallowed(cu2, dis2, allow2)
                        and cu2 not in res.seen
                        and cu2 not in res.frontier
                    ):
                        if cu2 in discovered:
                            ph, ppr, pdep = discovered[cu2]
                            discovered[cu2] = (ph, max(ppr, pr), min(pdep, dep))
                        else:
                            discovered[cu2] = (ch2, pr, dep)
                continue
            res.crawl_log.append((rnd, seq, h, url, "fetched"))
            fetched_per_host[h] = fetched_per_host.get(h, 0) + 1
            text = clean_html(html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html)
            res.pages[url] = (text, lang, pub)

            for link in links:
                cu = canonical_url(link)
                if not is_fetchable(cu):
                    continue
                ch = host_of(cu)
                dis, allow, _cd = robots_by_host.get(ch, (None, None, None))
                if is_disallowed(cu, dis, allow):
                    continue
                if cu in res.seen or cu in res.frontier:
                    continue
                cp = child_priority(pr)
                if cu in discovered:
                    ph, ppr, pdep = discovered[cu]
                    discovered[cu] = (ph, max(ppr, cp), min(pdep, dep + 1))
                else:
                    discovered[cu] = (ch, cp, dep + 1)

        for cu, (ch, cp, cdep) in discovered.items():
            res.frontier[cu] = (ch, cp, cdep, rnd)

    return res
