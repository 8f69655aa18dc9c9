"""URL canonicalization and host hashing — pure Column expressions (F16/F17
in SURVEY.md §2.5). The frontier/seen tables never shuffle raw URLs; they
shuffle ``(bucket, url_hash)`` built from these (north rule; SURVEY.md §4.3).

The reference stores ``article.html.requested_url`` raw
(/root/reference/data_extraction/crawl_articles.py:107) and has no
canonicalization — these are engine additions required by the north rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: number of hash buckets for frontier/seen partitioning at sandbox scale.
#: At 10^10-URL scale set B >= 128 so each bucket's seen-set bloom
#: (~1.2 GB per 10^9 urls @1% FPP) fits executor memory (SURVEY.md §4.3).
DEFAULT_BUCKETS = 8
DEFAULT_SALTS = 4


def canonical_url(url: Column) -> Column:
    """Lowercase scheme+host, strip fragment, default ports, trailing slash.

    Deterministic and idempotent (property-tested).
    """
    # fragment first, trim second: fragment removal can expose trailing
    # whitespace ("…/ #frag"), so trimming before it breaks idempotency
    # (hypothesis-found; mirrored in crawl/semantics.py)
    c = F.regexp_replace(url, r"#.*$", "")
    c = F.trim(c)
    # lowercase scheme://host (keep path case)
    c = F.concat(
        F.lower(F.regexp_extract(c, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)),
        F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
    )
    # drop default ports
    c = F.regexp_replace(c, r"^(https://[^/:]+):443(/|$)", r"$1$2")
    c = F.regexp_replace(c, r"^(http://[^/:]+):80(/|$)", r"$1$2")
    # strip trailing slash on non-root paths
    c = F.regexp_replace(c, r"(.+[^/])/$", r"$1")
    return c


def host_of(url: Column) -> Column:
    """Canonicalized host of a URL (lowercased, port stripped)."""
    return F.lower(F.regexp_replace(F.parse_url(url, F.lit("HOST")), r":\d+$", ""))


def url_hash(url: Column) -> Column:
    """64-bit identity hash of the canonical URL (JVM xxhash64 — stable
    across Spark versions and platforms)."""
    return F.xxhash64(canonical_url(url))


def host_bucket(host: Column, n_buckets: int = DEFAULT_BUCKETS) -> Column:
    """Partition bucket from the canonical host hash."""
    return F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int")


def url_salt(url: Column, n_salts: int = DEFAULT_SALTS) -> Column:
    """Per-URL salt to spread hot hosts across shuffle partitions; politeness
    re-aggregates per host afterwards (two-phase top-k, SURVEY.md §4.3)."""
    return F.pmod(F.xxhash64(url), F.lit(n_salts)).cast("int")
