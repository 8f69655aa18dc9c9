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

__all__ = ["with_global_rank", "with_group_rank", "grouped_row_number"]

# A group above this many rows stops fitting comfortably in one task's
# window sort and dispatches to the distributed form — same order of
# magnitude as the frontier's attach_seq gate (crawl/frontier.py:
# SEQ_RANK_THRESHOLD), the engine's standing size-aware dispatch pattern.
GROUP_RANK_THRESHOLD = 65536


def grouped_row_number(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    out_col: str = "rn",
    threshold: int | None = None,
    max_group_rows: int | None = None,
) -> DataFrame:
    """Size-aware per-group ``row_number`` (1-based, so drop-in for
    ``row_number() OVER (PARTITION BY g ORDER BY ...)``): the window form
    when every group fits one task's sort, ``with_group_rank`` (global
    range rank minus broadcast per-group minimum) when any group is
    data-sized — a single dominant source/language must not funnel the
    whole corpus through one task.

    The gate: ``max_group_rows`` if the caller already knows it (the
    attach_seq pattern — frontier bookkeeping knows the popped count),
    else ONE probe aggregation (groupBy(g).count().max() — map-side
    partials, O(|groups|) shuffle, 1-row collect; the same O(|groups|)
    state the distributed path's broadcast minimum needs anyway).

    ``order`` must total-order within groups (include a unique
    tiebreaker) — both paths then produce identical values; the planted
    90%-one-group test in tests/test_text_ops.py pins window ≡
    distributed equality above and below the gate.

    ``threshold`` defaults to the module-level GROUP_RANK_THRESHOLD at
    CALL time (not def time) so tests can lower the gate and drive the
    registered queries down the distributed path on small corpora.
    """
    if threshold is None:
        threshold = GROUP_RANK_THRESHOLD
    if max_group_rows is None:
        row = (
            df.groupBy(*group_cols)
            .agg(F.count("*").alias("__n"))
            .agg(F.max("__n").alias("__m"))
            .collect()[0]
        )
        max_group_rows = row["__m"] or 0
    if max_group_rows <= threshold:
        w = Window.partitionBy(*group_cols).orderBy(*order)
        return df.withColumn(out_col, F.row_number().over(w).cast("long"))
    ranked = with_group_rank(df, group_cols, order, out_col="__gr0")
    return ranked.withColumn(out_col, (F.col("__gr0") + 1).cast("long")).drop(
        "__gr0"
    )


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


def with_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    out_col: str = "group_rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed PER-GROUP rank — the scale-correct form of
    ``row_number() OVER (PARTITION BY g ORDER BY ...)`` when single groups
    are data-sized.

    The windowed form puts each group's entire row set into one task's
    sort (spilled, but still one task — a 20-TB 'en' slice ranks on one
    core). Here the group columns LEAD the global composite order, so the
    range partitioner spreads every group across many partitions, and the
    per-group rank falls out arithmetically:

        group_rank = global_rank - min(global_rank) over the group

    The per-group minimum is a tiny aggregation (one row per group) joined
    back broadcast — O(|groups|) state, never a per-group sort in one
    task. Inherits with_global_rank's exchange-reuse guarantee (refuses to
    build without it) and its pinned partition count. 0-based, like
    with_global_rank; ``order`` must total-order WITHIN groups (include a
    unique tiebreaker).

    This is the scale path the per-language tertile rank
    (plans/catalog_selection.py:ccnet_perplexity_buckets) documents: swap
    its window for this operator when a language outgrows a task.
    """
    gcols = [F.asc(c) for c in group_cols]
    ranked = with_global_rank(
        df, gcols + list(order), out_col="__grank", num_partitions=num_partitions
    )
    mins = ranked.groupBy(*group_cols).agg(F.min("__grank").alias("__gmin"))
    return (
        ranked.join(F.broadcast(mins), list(group_cols))
        .withColumn(out_col, (F.col("__grank") - F.col("__gmin")).cast("long"))
        .drop("__grank", "__gmin")
    )
