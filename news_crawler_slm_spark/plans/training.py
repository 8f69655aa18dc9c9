"""Composed training-data preparation pipeline.

The catalog exposes each training-data operator as a standalone oracle-
checked query; this module composes them the way a real corpus job runs
them, as ONE lazy plan:

    quality gate → exact dedup → deterministic shuffle → token-budget pack

- quality gate: the same Column heuristics the streaming path applies
  (streaming/quality.py — shared implementation, batch and stream).
- exact dedup: min doc_id per md5(text) content group (catalog
  `exact_dedup` semantics), via a window over the hash — one shuffle.
- shuffle: Knuth multiplicative-hash bijection (catalog
  `training_shuffle`), so epoch order is deterministic and unique.
- packing: exclusive prefix sum of token counts in shuffle order through
  operators/prefix_sum (bucket-parallel, no SinglePartition exchange),
  batch_id = floor(cum/budget).

Sequential-oracle equivalence is pinned in tests/test_pipeline.py.
Reference analog: the single-process dataset pipeline feeding
finetune_model.py (cited for scope; there is no distributed equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.prefix_sum import running_sum_by_key
from ..streaming.quality import quality_gate


@dataclass(frozen=True)
class TrainingPrepParams:
    min_tokens: int = 5
    max_punct_ratio: float = 0.3
    token_budget: int = 512


def prepare_training_data(docs: DataFrame, params: TrainingPrepParams) -> DataFrame:
    """docs needs (doc_id, text). Returns one row per surviving document:
    (doc_id, text, n_tokens, shuffle_key, cum_before, batch_id), where
    batch_id groups documents into ``token_budget``-sized training batches
    in deterministic shuffled order."""
    gated = quality_gate(
        docs,
        min_tokens=params.min_tokens,
        max_punct_ratio=params.max_punct_ratio,
    )

    w = Window.partitionBy("__h").orderBy("doc_id")
    deduped = (
        gated.withColumn("__h", F.md5("text"))
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__h", "__rn")
    )

    keyed = deduped.withColumn(
        "shuffle_key", (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    )
    packed = running_sum_by_key(keyed, key="shuffle_key", weight="n_tokens")
    return packed.select(
        "doc_id",
        "text",
        "n_tokens",
        "shuffle_key",
        "cum_before",
        F.floor(F.col("cum_before") / F.lit(float(params.token_budget)))
        .cast("long")
        .alias("batch_id"),
    )
