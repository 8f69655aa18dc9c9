"""Distributed global prefix sum — the scale-correct form of
``sum(w) OVER (ORDER BY key)``.

A plain global-ordered window in Spark compiles to a SinglePartition
exchange: every row funnels through one task, which is the canonical
100 TB scale-killer.  This operator computes the identical result in two
phases, both fully parallel:

1. **bucketize** — assign each row a deterministic, order-contiguous
   bucket from the key's value range (``floor((key-min)*B/(max-min+1))``).
   min/max come from one cheap aggregation (a control action, O(1) rows).
   Skewed key distributions only skew bucket *sizes* (perf), never
   correctness.
2. **offsets** — per-bucket totals (one small shuffle of B rows),
   exclusive-prefix-summed driver-side (O(B) control state, like the
   frontier's bloom handles), broadcast back.
3. **local cumsum** — ``Window.partitionBy(bucket).orderBy(key)``: an
   ordinary hash-partitioned window, B-way parallel.  Global running sum =
   bucket offset + local running sum.

Exactness: integer weights make the sum order-independent; the bucket
order equals the key order because buckets are range-contiguous.
Partition-count invariance and the no-SinglePartition plan shape are
asserted in tests/test_pipeline.py.

Primary consumer: token-budget sequence packing for training-data batches
(``token_budget_packing`` in plans/catalog.py) — an engine addition beyond
the reference, which packs on a single process (finetune_model.py's
dataset pipeline has no distributed equivalent; cited for scope, not
semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["running_sum_by_key"]


def running_sum_by_key(
    df: DataFrame,
    key: str,
    weight: str,
    n_buckets: int = 32,
    out_col: str = "cum_before",
) -> DataFrame:
    """Add ``out_col`` = sum of ``weight`` over all rows with a strictly
    smaller ``key`` (exclusive prefix sum in key order).

    ``key`` must be unique per row and numeric (castable to long);
    ``weight`` must be integral — both hold for (doc_id, token_count)
    packing.  Extra columns pass through untouched.

    Key-span limit: the bucket expression multiplies ``(key-lo) *
    n_buckets`` in signed-64 arithmetic, so the key range (hi-lo+1) must
    stay below 2^63 / n_buckets (~2^58 at the default 32 buckets) or the
    multiply would wrap and bucket order would silently stop tracking key
    order.  Raises ValueError beyond that — callers with full-range 64-bit
    hash keys should pre-fold them (e.g. ``key % 2^32``, as the
    training-shuffle path does) before packing.
    """
    bounds = df.agg(
        F.min(F.col(key).cast("long")).alias("lo"),
        F.max(F.col(key).cast("long")).alias("hi"),
    ).collect()[0]
    if bounds["lo"] is None:  # empty input
        return df.withColumn(out_col, F.lit(0).cast("long"))
    lo, hi = int(bounds["lo"]), int(bounds["hi"])
    span = hi - lo + 1
    if span > (2**63) // n_buckets:
        raise ValueError(
            f"key span {span} * n_buckets {n_buckets} would overflow signed "
            f"64-bit bucket arithmetic (limit {(2**63) // n_buckets}); fold "
            "the key into a narrower range first"
        )
    b = F.floor(
        ((F.col(key).cast("long") - F.lit(lo)) * F.lit(n_buckets)) / F.lit(span)
    ).cast("int")
    with_bucket = df.withColumn("__bucket", b)

    totals = (
        with_bucket.groupBy("__bucket")
        .agg(F.sum(F.col(weight).cast("long")).alias("__total"))
        .collect()
    )
    per_bucket = {int(r["__bucket"]): int(r["__total"]) for r in totals}
    offsets, acc = {}, 0
    for bucket in sorted(per_bucket):
        offsets[bucket] = acc
        acc += per_bucket[bucket]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(k_, v) for k_, v in offsets.items()], "__bucket int, __offset long"
    )

    w = (
        Window.partitionBy("__bucket")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_bucket.join(F.broadcast(offsets_df), "__bucket")
        .withColumn(
            out_col,
            (
                F.col("__offset")
                + F.sum(F.col(weight).cast("long")).over(w)
                - F.col(weight).cast("long")
            ).cast("long"),
        )
        .drop("__bucket", "__offset")
    )
