"""Distributed global rank — the scale-correct form of
``row_number() OVER (ORDER BY ...)`` for composite sort keys.

A global-ordered window compiles to an Exchange SinglePartition: every row
funnels through one task — fine for control-sized sets, a scale-killer and
a latency tax for data-sized ones (it was the tail stage of the frontier
pop, where rank = the crawl's deterministic fetch sequence).

``with_global_rank`` computes the identical value in one LAZY plan:

1. range-partition on the sort key (``repartitionByRange``) — partition i
   holds keys strictly ordered before partition i+1;
2. per-partition counts → exclusive prefix sum over the partition ids (a
   single-partition window over B rows — B = shuffle parallelism, control
   state, not data) → broadcast;
3. per-partition ``row_number`` + the broadcast offset.

Both consumers of the range exchange (the counts aggregate and the final
window) are the same subplan, so Spark's exchange reuse executes the
shuffle ONCE and both read the same files — this is what makes the
sampling-based range partitioner safe: partition bounds are decided once
per execution, never independently per pass (asserted via ReusedExchange
in tests/test_crawl.py).

Unlike operators/prefix_sum (numeric single-column keys, weight sums),
this handles arbitrary composite orderings (e.g. priority DESC, host ASC,
url ASC) and needs no driver-side action at plan-build time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_global_rank"]


def with_global_rank(
    df: DataFrame, order: list[Column], out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``out_col`` = this row's 0-based position in the total order
    defined by ``order`` (which must be a total order — include a unique
    tiebreaker column). Extra columns pass through untouched.

    Correctness requires exchange reuse (module doc): with it disabled the
    counts branch and the window branch would sample range bounds
    independently and silently produce wrong ranks — so the operator
    refuses to build rather than corrupt.

    The range repartition always gets an EXPLICIT partition count
    (``num_partitions``, default spark.sql.shuffle.partitions): a
    repartitionByRange without one is eligible for AQE partition
    coalescing, and the correctness argument needs both consumers of the
    reused exchange to observe the identical partition layout — pinning
    the count removes the coalescing degree of freedom rather than
    trusting runtime plan shapes."""
    spark = df.sparkSession
    if spark.conf.get("spark.sql.exchange.reuse", "true").lower() != "true":
        raise RuntimeError(
            "with_global_rank requires spark.sql.exchange.reuse=true: "
            "without exchange reuse the two consumers of the range shuffle "
            "would sample independent partition bounds and ranks would be "
            "silently wrong"
        )
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = df.repartitionByRange(num_partitions, *order).withColumn(
        "__pid", F.spark_partition_id()
    )
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__n"))
    w_off = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("__n").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(*order)
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(
            out_col,
            (F.col("__off") + F.row_number().over(w_local) - 1).cast("long"),
        )
        .drop("__pid", "__off")
    )
