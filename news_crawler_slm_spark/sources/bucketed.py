"""Bucketed (co-located) table support — shuffle elimination for repeated
fact-fact joins.

At 100 TB the single most expensive physical operation is the shuffle of a
fact table for a join or aggregation on its key.  Bucketing pays that
shuffle ONCE at write time: both sides persisted with ``bucketBy(B, key)``
(and ``sortBy`` within buckets) hash-split rows into B files per
partition, and every later equi-join or groupBy on the bucket key reads
bucket i against bucket i directly — zero Exchange in the plan, asserted
in tests/test_bucketed.py.  This is the storage-layout counterpart of the
frontier's explicit (bucket, salt) partitioning (crawl/frontier.py): the
crawl re-derives co-location per round because its tables churn, while the
immutable corpus tables (pages, documents, lineitem-shaped facts) earn a
one-time bucketed layout.

Bucket-count discipline (SURVEY.md §4.2): both sides must share B (or one
must be a multiple with ``spark.sql.bucketing.coalesceBucketsInJoin``);
pick B so a bucket's largest partition fits an executor's memory at target
scale — for a 100 TB fact with 512 MB target splits that is B ≈ 200k,
far above any per-file overhead concern on HDFS/object stores.

Reference analog: none — the reference holds everything in per-publisher
JSONL files (data_extraction/crawl_articles.py); co-location is an
engine-level concept the sequential implementation never needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join_ready"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a managed parquet table bucketed (and by default
    sorted) by ``key``.  Joins/aggregations between tables bucketed on the
    same key with the same ``n_buckets`` run shuffle-free."""
    cols = [key] if isinstance(key, str) else list(key)
    writer = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort:
        writer = writer.sortBy(*cols)
    writer.saveAsTable(table)


def bucketed_join_ready(spark: SparkSession, left: str, right: str) -> bool:
    """True iff both managed tables share bucket spec metadata (same bucket
    columns + count), i.e. an equi-join on the bucket key will plan without
    an Exchange.  A missing table raises (AnalysisException) rather than
    reading as "not ready" — misconfiguration should surface, not mask."""

    def spec(name: str):
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        info = {r["col_name"]: r["data_type"] for r in rows}
        return info.get("Num Buckets"), info.get("Bucket Columns")

    l_spec = spec(left)
    return l_spec == spec(right) and l_spec[0] is not None
