"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich et al.
2016) — the tokenizer-construction stage of an LLM data pipeline, run over
the same corpus the engine cleans and packs (reference analog: the
reference LOADS a pretrained HF tokenizer, step_04_get_token_statistics.py
:95-96; training one is the upstream step it never shows).

The classic trick that makes BPE tractable at corpus scale: merges operate
on the DISTINCT-WORD dimension weighted by word frequency, never on the
corpus itself. The word dim is Heaps-law small (|vocab| grows ~sqrt of
corpus size), so a 100 TB corpus still trains over a dim of at most a few
hundred million rows — and that dim is the ONLY distributed state here:

- one explode + groupBy(word) shuffle builds the weighted word dim (the
  same dim every LM query in plans/catalog.py uses);
- each merge step is a pair-count aggregation over the dim (map-side
  partial agg, shuffle on the pair key) followed by an O(1)-row argmax to
  the driver — driver state is ONE (left, right, count) row per merge,
  the k-means-loop discipline (plans/catalog_dedup.py ivf_kmeans);
- the rewrite applies the chosen merge to each word's symbol array in an
  Arrow-batched pandas_udf (greedy left-to-right, standard BPE), then
  persists the new dim and unpersists the old so the loop's lineage and
  memory stay bounded.

Determinism: the argmax tie-break is (count DESC, left ASC, right ASC) —
a total order, so the merge sequence is identical on any partitioning and
any parallelism, and identical to the sequential twin (tests/test_bpe.py).
"""

from __future__ import annotations

from typing import List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

__all__ = [
    "train_bpe",
    "bpe_train_sequential",
    "bpe_merge_word",
    "bpe_encode_word",
    "bpe_encode",
]


def _pair_counts(dim: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays."""
    pairs = dim.where(F.size("symbols") >= 2).select(
        "wc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("symbols") - 2),
                lambda i: F.struct(
                    F.col("symbols")[i].alias("left"),
                    F.col("symbols")[i + 1].alias("right"),
                ),
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.left", "p.right").agg(F.sum("wc").alias("c"))


def bpe_merge_word(symbols: List[str], left: str, right: str) -> List[str]:
    """Greedy left-to-right non-overlapping merge of (left, right) — the
    standard BPE rewrite; shared verbatim by the distributed pandas_udf
    and the sequential twin so they cannot diverge."""
    out: List[str] = []
    i, n = 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == left and symbols[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


def train_bpe(
    words: DataFrame,
    num_merges: int,
    word_col: str = "w",
    count_col: str = "wc",
) -> Tuple[List[Tuple[str, str]], DataFrame]:
    """Train ``num_merges`` BPE merges over a weighted word dim.

    ``words``: DataFrame with a distinct word column and a count column
    (the output shape of ``groupBy(word).count()``). Returns the ordered
    merge list and the final dim with a ``symbols`` array column.

    Stops early when no adjacent pair remains (every word fused to one
    symbol). Each iteration persists the rewritten dim and unpersists the
    previous one — O(1) cached generations, lineage cut per step.
    """
    spark = words.sparkSession
    dim = words.select(
        F.col(word_col).alias("w"),
        F.col(count_col).cast("long").alias("wc"),
        F.split(F.col(word_col), "").alias("symbols"),
    ).persist()
    dim.count()

    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        # Argmax with a total (c DESC, left, right) order: one 1-row collect.
        best = (
            _pair_counts(dim)
            .orderBy(F.desc("c"), "left", "right")
            .limit(1)
            .collect()
        )
        if not best:
            break
        left, right = best[0]["left"], best[0]["right"]
        merges.append((left, right))

        @F.pandas_udf(ArrayType(StringType()))
        def _merge(col: pd.Series) -> pd.Series:
            return col.map(lambda s: bpe_merge_word(list(s), left, right))

        new_dim = dim.select(
            "w", "wc", _merge(F.col("symbols")).alias("symbols")
        ).persist()
        new_dim.count()
        dim.unpersist()
        dim = new_dim

    return merges, dim


def bpe_train_sequential(
    word_counts: dict[str, int], num_merges: int
) -> Tuple[List[Tuple[str, str]], dict[str, List[str]]]:
    """Pure-Python sequential twin (test oracle): identical merge order and
    final symbol arrays as :func:`train_bpe` on the same word counts."""
    syms = {w: list(w) for w in word_counts}
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        counts: dict[Tuple[str, str], int] = {}
        for w, s in syms.items():
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        syms = {w: bpe_merge_word(s, best[0], best[1]) for w, s in syms.items()}
    return merges, syms


def bpe_encode_word(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Encode one word with a trained merge list: apply every merge in
    training order (each one the same greedy left-to-right rewrite used in
    training), so encoding a word the trainer saw reproduces the trainer's
    final segmentation EXACTLY — the roundtrip invariant tests/test_bpe.py
    pins. The equivalent priority-queue encoder is an optimization with
    identical output; this form IS the definition."""
    syms = list(word)
    for left, right in merges:
        if len(syms) < 2:
            break
        syms = bpe_merge_word(syms, left, right)
    return syms


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    out_col: str = "subwords",
) -> DataFrame:
    """Apply a trained BPE tokenizer to a text column: adds ``out_col``
    (array of subword tokens, whitespace-split words each encoded by
    :func:`bpe_encode_word`) and ``n_subwords``.

    Scale shape: the merge list is O(vocab) driver state shipped once per
    task inside the UDF closure (the broadcast-dim discipline — at a real
    32k-merge vocab that is ~1 MB); encoding runs in an Arrow-batched
    pandas_udf with a PER-BATCH word cache, so each distinct word in a
    batch is encoded once regardless of its frequency — Zipf makes the
    cache hit rate the dominant term, the same reason training runs on the
    word dim. Zero shuffles: a pure projection over the corpus scan.
    """
    mlist = [tuple(m) for m in merges]

    @F.pandas_udf(ArrayType(StringType()))
    def _encode(col: pd.Series) -> pd.Series:
        cache: dict[str, List[str]] = {}

        def enc(text: str) -> List[str]:
            out: List[str] = []
            for w in (text or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode_word(w, mlist)
                out.extend(got)
            return out

        return col.map(enc)

    enc_col = _encode(F.col(text_col))
    return df.withColumn(out_col, enc_col).withColumn(
        "n_subwords", F.size(F.col(out_col)).cast("long")
    )
