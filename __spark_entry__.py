"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query on sf0.001.
``queries()`` — every implemented operator from SURVEY.md §2, built from
``news_crawler_slm_spark.plans`` (one registry entry per operator).
``oracle_sql()`` — the DuckDB twin for every SQL-expressible query; hash-
sensitive numeric conventions are documented in
``news_crawler_slm_spark/plans/catalog.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_crawler_slm_spark.plans import (  # noqa: E402
    REGISTRY,
    driver_ordered_registry,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the extraction-chain
    analog — per-language doc counts + token stats after the quality filter
    chain (split assign → token filter → shrink), exercising window, join,
    filter and aggregation in one plan."""
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    fn, _ = REGISTRY["token_filter"]
    kept = fn(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        docs.join(kept.select("doc_id"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # driver-gate priority order: the external gate checks the first 50
    # entries, so never-checked / this-round-changed queries lead and the
    # most redundantly-covered ones trail (see plans/__init__.py)
    return {name: spec[0] for name, spec in driver_ordered_registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: spec[1]
        for name, spec in driver_ordered_registry().items()
        if spec[1] is not None
    }
