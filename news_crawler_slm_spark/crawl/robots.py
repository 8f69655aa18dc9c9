"""robots.txt parsing: raw fetched bytes -> the engine's ``robots`` table
(host, disallow, crawl_delay) consumed by the politeness gate
(frontier.pop_round / semantics.host_budget).

The reference delegates robots handling entirely to Fundus
(/root/reference/data_extraction/crawl_articles.py:87-90); the north rule
requires it in-engine. Parsing follows RFC 9309 plus the de-facto
``Crawl-delay`` extension:

- group = one or more ``User-agent`` lines followed by rules;
- the group chosen for an agent is the longest-token match, with ``*`` as
  fallback (exact product-token match beats the wildcard);
- ``Allow`` AND ``Disallow`` rules are both recorded; the politeness gate
  applies RFC 9309 longest-match precedence (most specific rule wins,
  Allow wins ties) — so ``Disallow: /`` + ``Allow: /news`` blocks the host
  EXCEPT the /news subtree (see semantics.is_disallowed / the
  frontier.disallowed_col Column twin);
- rules are path prefixes, plus the RFC's optional wildcards: ``*``
  matches any character run and a trailing ``$`` anchors the rule at the
  path end (matching in semantics.robots_rule_matches / the regex-
  translated branch of frontier.disallowed_col; precedence still counts
  the rule's literal octet length, per the RFC);
- ``Disallow:``/``Allow:`` with empty value record no rule;
- ``Crawl-delay`` applies per chosen group; non-numeric values ignored;
- unknown directives and comments (#) are skipped; BOM tolerated.

``parse_robots`` is a pure function (same implementation for tests and the
distributed path); ``robots_table`` maps it over a DataFrame of raw fetch
results as an Arrow-batched stage — at 10^10-URL scale robots fetching is
itself a (tiny) crawl whose results land in a table, exactly this shape.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame

from .semantics import DEFAULT_CRAWL_DELAY


@dataclass(frozen=True)
class RobotsRules:
    disallow: tuple[str, ...]
    allow: tuple[str, ...] = ()
    crawl_delay: float | None = None


def parse_robots(text: str, agent: str = "*") -> RobotsRules:
    """Parse robots.txt text; return the rule group applying to ``agent``."""
    # (agents, disallows, allows, delay)
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_dis, cur_allow, cur_delay, in_rules
        if cur_agents:
            groups.append((cur_agents, cur_dis, cur_allow, cur_delay))
        cur_agents, cur_dis, cur_allow, cur_delay, in_rules = [], [], [], None, False

    for raw in text.lstrip("﻿").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if in_rules:
                flush()
            cur_agents.append(value.lower())
        elif key in ("disallow", "allow", "crawl-delay"):
            if not cur_agents:
                continue  # rules before any user-agent line: ignored
            in_rules = True
            if key == "disallow" and value:
                cur_dis.append(value)
            elif key == "allow" and value:
                cur_allow.append(value)
            elif key == "crawl-delay":
                try:
                    cur_delay = float(value)
                except ValueError:
                    pass
        # other directives (sitemap, host, ...) don't close a group
    flush()

    agent_l = agent.lower()
    # (match_len, dis, allow, delay)
    best: tuple[int, list[str], list[str], float | None] | None = None
    for agents, dis, allow, delay in groups:
        for a in agents:
            if a == "*":
                score = 0
            elif a and (agent_l == a or a in agent_l):
                score = len(a)
            else:
                continue
            if best is None or score > best[0]:
                best = (score, dis, allow, delay)
    if best is None:
        return RobotsRules(disallow=(), allow=(), crawl_delay=None)
    return RobotsRules(disallow=tuple(best[1]), allow=tuple(best[2]), crawl_delay=best[3])


ROBOTS_OUT_SCHEMA = (
    "host string, disallow array<string>, allow array<string>, crawl_delay double"
)


def robots_table(raw: DataFrame, agent: str = "*") -> DataFrame:
    """raw(host string, body binary|string) -> robots table rows.

    Missing/empty/undecodable bodies yield allow-all with the default
    crawl delay (the polite failure mode)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hosts, dis, allows, delays = [], [], [], []
            for host, body in zip(pdf["host"], pdf["body"]):
                if body is None:
                    rules = RobotsRules((), (), None)
                else:
                    if isinstance(body, (bytes, bytearray)):
                        text = bytes(body).decode("utf-8", errors="replace")
                    else:
                        text = str(body)
                    rules = parse_robots(text, agent)
                hosts.append(host)
                dis.append(list(rules.disallow))
                allows.append(list(rules.allow))
                delays.append(
                    rules.crawl_delay if rules.crawl_delay is not None else DEFAULT_CRAWL_DELAY
                )
            yield pd.DataFrame(
                {"host": hosts, "disallow": dis, "allow": allows, "crawl_delay": delays}
            )

    return raw.select("host", "body").mapInPandas(run, ROBOTS_OUT_SCHEMA)
