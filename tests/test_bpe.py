"""BPE tokenizer training: distributed trainer ≡ sequential twin, merge
determinism under repartitioning, and the greedy rewrite's edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_crawler_slm_spark.operators.bpe import (
    bpe_merge_word,
    bpe_train_sequential,
    train_bpe,
)

# Weighted corpus with a designed merge order: 'lo' dominates (low x7,
# lower x3, slow x5 -> 15), then merged symbols keep fusing.
WORD_COUNTS = {
    "low": 7,
    "lower": 3,
    "slow": 5,
    "newest": 6,
    "widest": 3,
    "new": 2,
    "a": 4,  # single char: never contributes a pair
}


def _words_df(spark, n_parts=1):
    df = spark.createDataFrame(
        [(w, c) for w, c in WORD_COUNTS.items()], "w string, wc long"
    )
    return df.repartition(n_parts) if n_parts > 1 else df


def test_train_bpe_matches_sequential_twin(spark):
    merges, dim = train_bpe(_words_df(spark), num_merges=6)
    exp_merges, exp_syms = bpe_train_sequential(WORD_COUNTS, 6)
    assert merges == exp_merges
    got = {r["w"]: list(r["symbols"]) for r in dim.collect()}
    assert got == exp_syms
    dim.unpersist()


def test_train_bpe_partitioning_invariant(spark):
    m1, d1 = train_bpe(_words_df(spark), num_merges=4)
    m5, d5 = train_bpe(_words_df(spark, n_parts=5), num_merges=4)
    assert m1 == m5
    assert sorted(map(tuple, d1.select("w", "symbols").collect())) == sorted(
        map(tuple, d5.select("w", "symbols").collect())
    )
    d1.unpersist()
    d5.unpersist()


def test_train_bpe_early_stop(spark):
    # Two single-char words: no adjacent pair exists, zero merges possible.
    df = spark.createDataFrame([("a", 3), ("b", 2)], "w string, wc long")
    merges, dim = train_bpe(df, num_merges=5)
    assert merges == []
    assert {r["w"]: list(r["symbols"]) for r in dim.collect()} == {
        "a": ["a"],
        "b": ["b"],
    }
    dim.unpersist()


def test_merge_word_greedy_non_overlapping():
    # 'aaa' with merge (a,a): greedy left-to-right gives [aa, a], not [a, aa]
    assert bpe_merge_word(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert bpe_merge_word(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    # merge absent -> unchanged
    assert bpe_merge_word(["x", "y"], "a", "b") == ["x", "y"]
    # merged symbol participates in later merges of itself
    assert bpe_merge_word(["ab", "ab"], "ab", "ab") == ["abab"]


def test_first_merge_agrees_with_pair_counts_query(spark):
    """The trainer's first argmax must be the top row of the oracle-twinned
    bpe_pair_counts aggregation over the same corpus."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    top = em.queries()["bpe_pair_counts"](spark, sf).limit(1).collect()[0]
    d = spark.read.parquet(f"{sf}/documents.parquet")
    words = d.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("w")
    )
    wdim = words.groupBy("w").agg(F.count("*").alias("wc"))
    merges, dim = train_bpe(wdim, num_merges=1)
    assert len(merges) == 1
    assert merges[0][0] + merges[0][1] == top["pair"]
    dim.unpersist()


def test_encode_roundtrips_training_segmentation(spark):
    """Encoding a word the trainer saw must reproduce the trainer's final
    symbol array exactly — in python and through the Spark projection."""
    from news_crawler_slm_spark.operators.bpe import bpe_encode, bpe_encode_word

    merges, dim = train_bpe(_words_df(spark), num_merges=6)
    final = {r["w"]: list(r["symbols"]) for r in dim.collect()}
    for w, syms in final.items():
        assert bpe_encode_word(w, merges) == syms, w
    dim.unpersist()

    corpus = spark.createDataFrame(
        [(1, "low lower slow"), (2, "newest widest new a"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: (list(r["subwords"]), r["n_subwords"])
            for r in bpe_encode(corpus, merges).collect()}
    exp1 = final["low"] + final["lower"] + final["slow"]
    exp2 = final["newest"] + final["widest"] + final["new"] + final["a"]
    assert rows[1] == (exp1, len(exp1))
    assert rows[2] == (exp2, len(exp2))
    assert rows[3] == ([], 0) and rows[4] == ([], 0)

    # unseen words segment deterministically with the same merges
    assert bpe_encode_word("lowest", merges) == bpe_encode_word("lowest", merges)
    assert "".join(bpe_encode_word("lowest", merges)) == "lowest"


def test_encode_is_shuffle_free(spark):
    from news_crawler_slm_spark.operators.bpe import bpe_encode

    corpus = spark.createDataFrame([(1, "low slow")], "doc_id long, text string")
    plan = bpe_encode(corpus, [("l", "o")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---- pure-python property tests (no Spark): the greedy rewrite invariants

from hypothesis import given, settings
from hypothesis import strategies as st

_SYM = st.text(alphabet="abc", min_size=1, max_size=2)


@settings(max_examples=200, deadline=None)
@given(st.lists(_SYM, max_size=12), _SYM, _SYM)
def test_merge_word_properties(symbols, left, right):
    from news_crawler_slm_spark.operators.bpe import bpe_merge_word

    out = bpe_merge_word(list(symbols), left, right)
    # 1. concatenation is preserved (merges never lose or invent bytes)
    assert "".join(out) == "".join(symbols)
    # 2. greedy completeness: no adjacent (left, right) pair survives —
    #    any survivor would have been merged when the scan reached it
    #    (a merge consumes both symbols, and the created symbol left+right
    #    can never equal the single symbol `left` since right is nonempty)
    assert all(
        not (a == left and b == right) for a, b in zip(out, out[1:])
    ), out
    # 3. idempotence: re-applying the same merge changes nothing
    assert bpe_merge_word(out, left, right) == out
    # 4. output length shrinks by exactly the number of merges performed
    merged = sum(1 for s in out if s == left + right and (left + right) not in symbols)
    assert len(out) <= len(symbols)


@settings(max_examples=100, deadline=None)
@given(st.lists(_SYM, min_size=1, max_size=10))
def test_encode_word_reconstructs(symbols):
    """Any merge sequence applied by the encoder preserves the word."""
    from news_crawler_slm_spark.operators.bpe import bpe_encode_word

    word = "".join(symbols)
    merges = [("a", "b"), ("ab", "c"), ("b", "b"), ("c", "a")]
    out = bpe_encode_word(word, merges)
    assert "".join(out) == word
    assert all(s for s in out)
