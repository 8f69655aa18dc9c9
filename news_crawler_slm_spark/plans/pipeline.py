"""The reference's preprocessing pipeline (data_ops step_01→06) as ONE
composed lazy plan over a ``pages`` DataFrame — SURVEY.md §3.2's lifecycle
replacement. The reference materializes every stage to disk and re-parses a
token-stats TEXT file as its join input (step_04:57-66 → step_05:30); here
the stats are a real table and the whole chain is lazy until the caller
writes a snapshot.

Stage map (reference file:line):
  step_01 (jsonl→arrow)            = the caller's explicit-schema scan
  step_02 (publisher split)        = md5-ranked deterministic permutation +
                                     the exact size arithmetic of :28-38
                                     (round(0.8*n); odd remainder → train)
  W1 stable position               = row_number over (split; publisher, url)
                                     (positional identity, step_04:41-42)
  step_03 (clean_html)             = Arrow UDF (functions/html_clean.py)
  step_04 (token statistics)       = token_stats DataFrame keyed
                                     (split, position, column)
  step_05 (threshold filter)       = LEFT ANTI JOIN on (split, position)
                                     against the over-threshold stats rows
                                     (J3 — the reference's regex re-parse
                                     becomes a relational anti-join)
  step_06 (shrink)                 = first-N per publisher in position
                                     order, NON-train splits only (:44-48)

Determinism note (SURVEY.md §1.4): the reference's own split is
irreproducible (``list(set(...))`` + seeded shuffle over hash-randomized
iteration order, step_02:21-25); the engine pins order-by-md5(publisher),
which the sequential oracle in tests/test_pipeline.py implements
identically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.udfs import clean_html_udf

_WS_COUNT = "size(split(trim(text), '\\\\s+'))"


@dataclass(frozen=True)
class PreprocessParams:
    train_frac: float = 0.8
    token_threshold: int = 60  # config.json:21-22 analog, corpus-scaled
    cap_n: int = 3  # step_06 per-publisher cap (non-train splits)


def assign_splits(publishers: DataFrame, params: PreprocessParams) -> DataFrame:
    """publishers(publisher) -> (publisher, split) with step_02:28-38 size
    arithmetic over the md5-deterministic permutation."""
    w = Window.orderBy(F.md5(F.col("publisher")))
    ranked = publishers.select(
        "publisher",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    sized = ranked.withColumn(
        "ts0", F.round(F.lit(params.train_frac) * F.col("n"), 0).cast("long")
    ).withColumn("rem", F.col("n") - F.col("ts0"))
    final = sized.withColumn("train_n", F.col("ts0") + F.col("rem") % 2).withColumn(
        "val_n", F.floor(F.col("rem") / 2)
    )
    return final.select(
        "publisher",
        F.when(F.col("rn") <= F.col("train_n"), "train")
        .when(F.col("rn") <= F.col("train_n") + F.col("val_n"), "val")
        .otherwise("test")
        .alias("split"),
    )


@dataclass
class PreprocessResult:
    cleaned: DataFrame  # url, publisher, split, position, text
    token_stats: DataFrame  # split, position, column, token_count
    final: DataFrame  # post-filter, post-shrink rows


def preprocess_pages(
    pages: DataFrame,
    params: PreprocessParams = PreprocessParams(),
    text_precleaned: bool = False,
) -> PreprocessResult:
    """pages(url, html, publisher, ...) -> the full step_02→06 chain, lazy.

    ``text_precleaned=True`` consumes pages that already carry extracted
    ``text`` (the crawl's pages table runs the SAME clean_html_udf as its
    extraction stage, crawl/rounds.py pages_delta) — the chain is
    identical from step_02 on; running the UDF twice would only re-clean
    clean text."""
    splits = assign_splits(pages.select("publisher").distinct(), params)

    w_pos = Window.partitionBy("split").orderBy("publisher", "url")
    with_text = (
        pages
        if text_precleaned
        else pages.withColumn("text", clean_html_udf(F.col("html")))
    )
    cleaned = (
        with_text.join(F.broadcast(splits), "publisher")
        .withColumn("position", F.row_number().over(w_pos) - 1)
        .select("url", "publisher", "split", "position", "text")
    )

    token_stats = cleaned.select(
        "split",
        "position",
        F.lit("text").alias("column"),
        F.expr(_WS_COUNT).cast("long").alias("token_count"),
    )

    over = token_stats.where(F.col("token_count") > params.token_threshold).select(
        "split", "position"
    )
    filtered = cleaned.join(over, ["split", "position"], "left_anti")

    w_cap = Window.partitionBy("split", "publisher").orderBy("position")
    final = (
        filtered.withColumn("__rn", F.row_number().over(w_cap))
        .where((F.col("split") == "train") | (F.col("__rn") <= params.cap_n))
        .drop("__rn")
    )
    return PreprocessResult(cleaned=cleaned, token_stats=token_stats, final=final)
