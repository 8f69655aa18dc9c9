"""robots.txt parser semantics + the distributed robots_table stage, and
its agreement with stdlib urllib.robotparser on can-fetch decisions."""

from __future__ import annotations

import urllib.robotparser

from hypothesis import given, settings
from hypothesis import strategies as st

from news_crawler_slm_spark.crawl.robots import parse_robots, robots_table
from news_crawler_slm_spark.crawl.semantics import DEFAULT_CRAWL_DELAY, is_disallowed

SAMPLE = """\
# comment line
User-agent: googlebot
Disallow: /google-only
Crawl-delay: 2

User-agent: *
Disallow: /private
Disallow: /tmp
Crawl-delay: 7.5
Sitemap: https://x/sitemap.xml

User-agent: evilbot
Disallow: /
"""


def test_group_selection_and_fields():
    star = parse_robots(SAMPLE, "mybot")
    assert star.disallow == ("/private", "/tmp")
    assert star.crawl_delay == 7.5
    goog = parse_robots(SAMPLE, "googlebot")
    assert goog.disallow == ("/google-only",) and goog.crawl_delay == 2.0
    evil = parse_robots(SAMPLE, "evilbot")
    assert evil.disallow == ("/",)


def test_edge_cases():
    assert parse_robots("").disallow == ()
    # empty Disallow value allows everything
    assert parse_robots("User-agent: *\nDisallow:").disallow == ()
    # rules before any user-agent line are ignored
    assert parse_robots("Disallow: /x\nUser-agent: *\nDisallow: /y").disallow == ("/y",)
    # a new user-agent after rules starts a NEW group
    r = parse_robots("User-agent: a\nDisallow: /a\nUser-agent: b\nDisallow: /b", "b")
    assert r.disallow == ("/b",)
    # bad crawl-delay ignored
    assert parse_robots("User-agent: *\nCrawl-delay: soon").crawl_delay is None


@given(
    st.lists(
        st.sampled_from(["/a", "/b/c", "/private", "/p"]), min_size=0, max_size=4, unique=True
    ),
    st.sampled_from(["/a", "/a/x", "/b", "/private/f", "/q"]),
)
@settings(max_examples=60, deadline=None)
def test_agrees_with_stdlib_robotparser(disallows, path):
    text = "User-agent: *\n" + "\n".join(f"Disallow: {d}" for d in disallows)
    rules = parse_robots(text)
    rp = urllib.robotparser.RobotFileParser()
    rp.parse(text.splitlines())
    ours = not is_disallowed(f"https://h{path}", list(rules.disallow))
    stdlib = rp.can_fetch("*", f"https://h{path}")
    # stdlib uses prefix matching like ours for plain paths
    assert ours == stdlib


def test_robots_table_stage(spark):
    rows = [
        ("a.com", SAMPLE.encode("utf-8")),
        ("b.com", None),
        ("c.com", b"User-agent: *\nCrawl-delay: 3\nDisallow: /x"),
    ]
    raw = spark.createDataFrame(rows, "host string, body binary")
    got = {r.host: (r.disallow, r.crawl_delay) for r in robots_table(raw).collect()}
    assert got["a.com"] == (["/private", "/tmp"], 7.5)
    assert got["b.com"] == ([], DEFAULT_CRAWL_DELAY)
    assert got["c.com"] == (["/x"], 3.0)
