"""Streaming quality gate over the pages firehose.

The batch quality scorer (`quality_features` in plans/catalog.py, C4/Gopher
heuristics) as a STREAM-side filter: pages flow in continuously and only
survivors reach the training-data sink; rejects are counted per micro-batch
rather than persisted (the batch reject-sink twin is `repetition_rejects`).

All predicates are built-in Column expressions — the gate adds no state, no
watermark, and no shuffle to the stream (a pure filter inside the file
source's projection), so it composes with any downstream windowed agg at
unchanged cost. Stream ≡ batch equivalence on identical input files is
asserted in tests/test_streaming.py.

Reference analog: step_05_filter_dataset.py filters the dataset between
batch stages; there is no streaming path in the reference at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quality_columns(text: Column) -> dict[str, Column]:
    """The shared quality metrics as Columns (same exprs as the batch
    `quality_features` query): whitespace token count, char count,
    punctuation ratio, stopword ratio."""
    toks = F.split(F.trim(text), r"\s+")
    stop = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]
    n_chars = F.length(text)
    return {
        "n_tokens": F.size(toks),
        "n_chars": n_chars,
        "punct_ratio": F.when(n_chars > 0,
            F.length(F.regexp_replace(text, r"[\w\s]", "")) / n_chars.cast("double")
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(F.size(toks) > 0,
            F.size(F.filter(toks, lambda t: F.lower(t).isin(stop)))
            / F.size(toks).cast("double")
        ).otherwise(F.lit(0.0)),
    }


def quality_gate(
    pages: DataFrame,
    min_tokens: int = 5,
    max_punct_ratio: float = 0.3,
    min_stopword_ratio: float = 0.0,
) -> DataFrame:
    """Filter a (streaming or batch) pages DataFrame down to quality
    survivors, with the metric columns attached for downstream scoring.

    Works identically on `readStream` and `read` inputs — the plan is a
    stateless projection+filter, so the streaming run on a set of files
    equals the batch run on the same files row-for-row.
    """
    cols = quality_columns(F.col("text"))
    scored = pages.select("*", *(c.alias(name) for name, c in cols.items()))
    return scored.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("punct_ratio") <= max_punct_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
    )
