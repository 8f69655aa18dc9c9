"""Structured-Streaming ingestion over the pages firehose.

The crawl itself runs as deterministic batch rounds (exact ordering
equivalence with the sequential oracle rules out async triggers —
SURVEY.md §2.9), but everything DOWNSTREAM of the crawl is a stream: pages
land continuously and consumers want rolling stats without re-scanning
history. This module is that consumer path:

  readStream(pages parquet dir) → watermark on warc_ts → tumbling-window
  aggregates → exactly-once sink (checkpointed)

Batch twins of these aggregations live in plans/catalog_joins.py
(``hourly_event_counts`` / ``sessionization``) and are oracle-checked; the
streaming test (tests/test_streaming.py) asserts stream results ≡ the batch
twin on the same files, plus exactly-once across restarts.

Reference analog: none — the reference re-reads whole datasets per stage
(compute_statistics/*; SURVEY.md §4.1 anti-pipelining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def pages_stream(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream of pages parquet (schema pinned — streaming
    inference is illegal anyway). ``maxFilesPerTrigger`` bounds micro-batch
    size at scale."""
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def windowed_lang_counts(
    pages: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling-window page counts + mean text length per lang, late data
    bounded by the watermark (state eviction — unbounded state is the #1
    way a 100 TB stream job dies)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_pages"),
            F.avg(F.length("text")).alias("mean_text_len"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "mean_text_len",
        )
    )


def run_available_now(
    result: DataFrame, out_dir: str, checkpoint_dir: str, output_mode: str = "append"
) -> None:
    """Drain everything currently available and stop — the batch-like test
    trigger; swap for processingTime on a live cluster. The checkpoint makes
    re-runs exactly-once (new files only)."""
    (
        result.writeStream.outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_dir)
        .start()
        .awaitTermination()
    )


def sliding_token_counts(
    pages: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """SLIDING-window token counts over the pages firehose — the trending-
    terms primitive (each event lands in window/slide overlapping windows;
    F.window emits them all, so no self-union). Streaming-legal shape:
    watermark -> explode -> window+token groupBy; state per (window, token)
    is evicted once the watermark passes the window end, so state is
    bounded by (windows in flight) x (vocab per window), never the corpus.

    Top-k selection is NOT in this query on purpose: rank-over-window isn't
    expressible inside a streaming aggregation (it would need the closed
    window), so the k-cut runs as the ``trending_tokens`` batch query over
    the drained sink — the standard split for this pattern.
    """
    toks = pages.withWatermark("warc_ts", watermark).select(
        "warc_ts",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("token"),
    )
    return (
        toks.where(F.col("token") != "")
        .groupBy(F.window("warc_ts", window, slide).alias("w"), "token")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "token",
            "n",
        )
    )


def trending_tokens(counts: DataFrame, k: int = 5) -> DataFrame:
    """Per-window top-k over a (window_start, window_end, token, n) counts
    table (the ``sliding_token_counts`` sink): rank partitioned by window
    with a total (n DESC, token ASC) tie-break. Batch side of the split —
    partition-local window, no global sort."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.desc("n"), "token"
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
