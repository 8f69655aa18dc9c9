"""Reusable relational operators built on window functions.

``salted_top_k_per_group`` is the skew-safe per-group top-k the frontier pop
is built on (SURVEY.md §2.6 W5, §4.3): a hot group (hot host) concentrates
its rows on one shuffle partition under a plain
``Window.partitionBy(group)``; salting splits each group across S
partitions for phase 1 and reduces the ≤ S*k survivors exactly in phase 2.
Associative and exact — property-tested equal to the unsalted global top-k
(tests/test_crawl.py)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame, group_cols: list[str], order: list[Column], k: Column | int
) -> DataFrame:
    """Plain windowed top-k (Catalyst rewrites the rank-filter to a
    per-partition group-limit — no global sort).

    ``order`` must be a TOTAL order within each group (include a unique
    tiebreaker): with duplicate sort keys row_number breaks ties by
    physical row order, so which duplicate survives is plan-dependent —
    true of this operator, the salted variant, and every top-k in the
    engine (the crawl's canonical order ends in `url` for this reason)."""
    w = Window.partitionBy(*group_cols).orderBy(*order)
    kcol = F.lit(k) if isinstance(k, int) else k
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= kcol)
        .drop("__rn")
    )


def salted_top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    k: Column | int,
    salt_col: str,
) -> DataFrame:
    """Two-phase exact top-k per group with pre-assigned salt column.

    Phase 1 limits each (group, salt) slice to k — correct because the true
    per-group top-k rows each live in SOME salt slice and survive their
    slice's local top-k. Phase 2 is the exact reduce over ≤ S*k rows."""
    kcol = F.lit(k) if isinstance(k, int) else k
    w1 = Window.partitionBy(*group_cols, salt_col).orderBy(*order)
    w2 = Window.partitionBy(*group_cols).orderBy(*order)
    phase1 = df.withColumn("__rn1", F.row_number().over(w1)).where(
        F.col("__rn1") <= kcol
    )
    return (
        phase1.withColumn("__rn2", F.row_number().over(w2))
        .where(F.col("__rn2") <= kcol)
        .drop("__rn1", "__rn2")
    )
