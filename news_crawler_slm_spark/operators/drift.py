"""Distribution-drift statistics, exact in integer arithmetic.

The two-sample Kolmogorov-Smirnov supremum gap is computed as
max |cum0·n1 − cum1·n0| over the merged support — pure BIGINT, so the
result is bit-identical on any engine and any partitioning; the familiar
D statistic is derived once from the exact integers. This is the drift
monitor a training-data pipeline runs between corpus snapshots, sources,
or train/val splits (plans/catalog.py:ks_drift_shards is the
driver-checked query form; crawl/rounds.py:corpus_drift_ks runs it
between time-travel snapshots of the crawled web).

Scale shape: one scan of the input, a value-keyed aggregation (shuffle
bounded by |distinct values|, map-side combined), a CDF window over the
aggregated support (global by construction — a CDF needs the total order
— but dim-sized: |support| ≪ rows), and a 1-row reduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ks_statistic(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One-row frame (n0, n1, d_scaled, ks_micro) for the two-sample KS
    statistic between ``group_col`` = 0 and = 1 rows over ``value_col``.
    ``d_scaled`` = max |cum0·n1 − cum1·n0| (exact BIGINT; D = d_scaled /
    (n0·n1)); ``ks_micro`` = D in micro units via one deterministic
    floor(x + 0.5).

    Exactness bound (ADVICE r06): the cum·n products are BIGINT, so the
    bit-identical claim holds only while n0·n1 < 2^63 — beyond ~3·10^9
    rows per side Spark would wrap silently while DuckDB raises; shard
    the comparison (per-source KS, ks_drift_shards style) before that
    point.  An empty side has no EDF and no defined statistic.  Both
    conditions are guarded LAZILY in the returned plan (assert_true rides
    the final aggregate — no extra pass, no eager job): evaluating the
    result raises a clear error instead of emitting a null/0-division
    ks_micro row."""
    g = (F.col(group_col) == 0).cast("long")
    v = df.groupBy(F.col(value_col).alias("val")).agg(
        F.sum(g).alias("c0"), F.sum(1 - g).alias("c1")
    )
    w = Window.orderBy("val").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    c = v.select(
        F.sum("c0").over(w).alias("cum0"),
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c0").over(tot).alias("n0"),
        F.sum("c1").over(tot).alias("n1"),
    )
    gap = F.abs(F.col("cum0") * F.col("n1") - F.col("cum1") * F.col("n0"))
    # lazy guards (see docstring): assert_true yields NULL when the
    # condition holds, so when(guard.isNull(), x) == x on the happy path
    # and raises at evaluation time otherwise — zero extra passes
    guard = F.assert_true(
        (F.max("n0") > 0)
        & (F.max("n1") > 0)
        & (
            F.max("n0").cast("double") * F.max("n1").cast("double")
            < F.lit(float(2**63))
        ),
        F.lit(
            "ks_statistic: needs both sides non-empty and n0*n1 < 2^63 "
            "(shard the comparison first — see ks_drift_shards)"
        ),
    )
    return c.agg(
        F.max("n0").cast("long").alias("n0"),
        F.max("n1").cast("long").alias("n1"),
        F.max(gap).cast("long").alias("d_scaled"),
        F.when(
            guard.isNull(),
            F.floor(
                F.max(gap) * F.lit(1000000.0) / (F.max("n0") * F.max("n1"))
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("ks_micro"),
    )
