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


def test_allow_longest_match_precedence():
    # the ADVICE r1 case: 'Disallow: /' + 'Allow: /news' must over-block
    # ONLY outside /news (RFC 9309 longest-match, Allow wins ties)
    r = parse_robots("User-agent: *\nDisallow: /\nAllow: /news")
    assert r.disallow == ("/",) and r.allow == ("/news",)
    assert is_disallowed("https://h/anything", list(r.disallow), list(r.allow))
    assert not is_disallowed("https://h/news", list(r.disallow), list(r.allow))
    assert not is_disallowed("https://h/news/today", list(r.disallow), list(r.allow))
    # more specific Disallow beats shorter Allow
    r2 = parse_robots("User-agent: *\nAllow: /a\nDisallow: /a/b")
    assert is_disallowed("https://h/a/b/c", list(r2.disallow), list(r2.allow))
    assert not is_disallowed("https://h/a/x", list(r2.disallow), list(r2.allow))
    # equal length: Allow wins the tie
    r3 = parse_robots("User-agent: *\nAllow: /ab\nDisallow: /ab")
    assert not is_disallowed("https://h/ab/x", list(r3.disallow), list(r3.allow))


def test_allow_column_twin_matches_python(spark):
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.crawl.frontier import disallowed_col

    cases = [
        ("https://h/anything", ["/"], ["/news"]),
        ("https://h/news/today", ["/"], ["/news"]),
        ("https://h/a/b/c", ["/a/b"], ["/a"]),
        ("https://h/a/x", ["/a/b"], ["/a"]),
        ("https://h/ab/x", ["/ab"], ["/ab"]),
        ("https://h/q", [], []),
        ("https://h/p12/x", ["/p1"], ["/p12"]),
        ("https://h/p11", ["/p1"], ["/p12"]),
    ]
    df = spark.createDataFrame(
        cases, "url string, disallow array<string>, allow array<string>"
    )
    got = [
        r[0]
        for r in df.select(
            disallowed_col(F.col("url"), F.col("disallow"), F.col("allow"))
        ).collect()
    ]
    want = [is_disallowed(u, d, a) for u, d, a in cases]
    assert got == want


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
        ("c.com", b"User-agent: *\nCrawl-delay: 3\nDisallow: /x\nAllow: /x/ok"),
    ]
    raw = spark.createDataFrame(rows, "host string, body binary")
    got = {
        r.host: (r.disallow, r.allow, r.crawl_delay)
        for r in robots_table(raw).collect()
    }
    assert got["a.com"] == (["/private", "/tmp"], [], 7.5)
    assert got["b.com"] == ([], [], DEFAULT_CRAWL_DELAY)
    assert got["c.com"] == (["/x"], ["/x/ok"], 3.0)


# ------------------------------------------------------ RFC 9309 wildcards

WILDCARD_CASES = [
    # (rule, path, matches) — the RFC / Google reference examples
    ("/fish*", "/fish", True),
    ("/fish*", "/fishheads/yummy", True),
    ("/fish*", "/Fish.asp", False),
    ("/*.php", "/index.php", True),
    ("/*.php", "/folder/filename.php?params", True),
    ("/*.php", "/", False),
    ("/*.php", "/windows.PHP", False),
    ("/*.php$", "/filename.php", True),
    ("/*.php$", "/filename.php?params", False),
    ("/fish*.php", "/fishheads/catfish.php?params", True),
    ("/fish*.php", "/Fish.PHP", False),
    ("/p", "/page", True),  # plain prefix unchanged
    ("/p$", "/p", True),  # anchor alone
    ("/p$", "/page", False),
    ("/a+b", "/a+b/c", True),  # regex specials in rules stay literal
    ("/a.b", "/axb", False),
]


def test_wildcard_rule_matching_pure():
    from news_crawler_slm_spark.crawl.semantics import robots_rule_matches

    for rule, path, want in WILDCARD_CASES:
        assert robots_rule_matches(path, rule) == want, (rule, path)


def test_wildcard_precedence_uses_rule_length():
    # Disallow /*.php (6 octets) vs Allow /folder (7 octets): Allow wins
    # for /folder/x.php; Disallow still blocks /other.php
    dis, allow = ["/*.php"], ["/folder"]
    assert not is_disallowed("https://h/folder/x.php", dis, allow)
    assert is_disallowed("https://h/other.php", dis, allow)


def test_wildcard_column_twin_matches_python(spark):
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.crawl.frontier import disallowed_col

    rows = []
    for i, (rule, path, _) in enumerate(WILDCARD_CASES):
        rows.append((i, f"https://h{path}", [rule], []))
    # plus longest-match interplay between wildcard and plain rules
    rows.append((len(rows), "https://h/folder/x.php", ["/*.php"], ["/folder"]))
    rows.append((len(rows), "https://h/other.php", ["/*.php"], ["/folder"]))
    df = spark.createDataFrame(
        rows, "i long, url string, dis array<string>, allow array<string>"
    )
    got = {
        r["i"]: r["blocked"]
        for r in df.select(
            "i",
            disallowed_col(F.col("url"), F.col("dis"), F.col("allow")).alias(
                "blocked"
            ),
        ).collect()
    }
    for i, (rule, path, want) in enumerate(WILDCARD_CASES):
        assert got[i] == is_disallowed(f"https://h{path}", [rule], []) == want, (
            rule,
            path,
        )
    assert got[len(WILDCARD_CASES)] is False
    assert got[len(WILDCARD_CASES) + 1] is True
