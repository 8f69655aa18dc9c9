"""Text-analysis operator semantics: language-ID accuracy on a labeled
marker-bearing corpus, tokenizer/fingerprint value pins, quality features.
(The driver's synthetic documents.text does not correlate with its lang
column — all languages share one vocabulary — so language-ID accuracy is
asserted here on real marker-bearing sentences instead; cross-engine value
identity of the langid query is covered by its DuckDB oracle.)"""

from __future__ import annotations

from news_crawler_slm_spark.functions import text as TX

# Small labeled corpus with genuine function words per language.
_LABELED = [
    ("en", "the cat sat on the mat and looked at the dog that barked"),
    ("en", "this is the house of the rising sun and that is all"),
    ("de", "der hund und die katze sind nicht in das haus gegangen"),
    ("de", "das ist der anfang und die geschichte ist nicht zu ende"),
    ("fr", "le chat est sur la table et les enfants mangent une pomme"),
    ("fr", "la maison est grande et le jardin est une merveille"),
    ("es", "el perro y los gatos que viven en una casa es grande"),
    ("es", "los ninos y el maestro dicen que una escuela es buena"),
    ("it", "il gatto che dorme di notte e una bella cosa per tutti"),
    ("it", "il mare di sera e una meraviglia che incanta per sempre"),
]


def test_langid_accuracy_on_labeled_corpus():
    correct = sum(1 for lang, s in _LABELED if TX.detect_language(s) == lang)
    assert correct == len(_LABELED)  # 100% on clear marker-bearing text


def test_langid_und_fallback():
    assert TX.detect_language("") == "und"
    assert TX.detect_language("xyzzy plugh 12345") == "und"


def test_langid_udf_matches_pure_function(spark):
    from news_crawler_slm_spark.functions.udfs import detect_language_udf

    df = spark.createDataFrame([(s,) for _, s in _LABELED], ["text"])
    got = [r[0] for r in df.select(detect_language_udf("text")).collect()]
    want = [TX.detect_language(s) for _, s in _LABELED]
    assert got == want


def test_ws_tokens_and_counts():
    assert TX.ws_tokens("  a  b\tc\n") == ["a", "b", "c"]
    assert TX.ws_tokens("") == []
    assert TX.ws_token_count("one two three") == 3


def test_bpeish_token_count_pins():
    # GPT-2-style regex: contractions split, digit runs, punct runs
    assert TX.bpeish_token_count("") == 0
    assert TX.bpeish_token_count("hello world") == 2
    assert TX.bpeish_token_count("it's fine") == 3  # it / 's / fine
    assert TX.bpeish_token_count("a1b") == 3  # letters/digits split
    assert TX.bpeish_token_count("wait... what?!") == 4


def test_repetition_severity_ratio_reference_semantics():
    # omit_degeneration.py:13-30 — <n tokens -> 0.0; multiplicity counting
    assert TX.repetition_severity_ratio("a b c") == 0.0
    text = " ".join(["a b c d e"] * 3)  # 15 tokens, heavy 5-gram repetition
    r = TX.repetition_severity_ratio(text)
    assert 0.0 < r <= 1.0
    # exact: 11 windows, each distinct 5-gram appears ... compute directly
    toks = text.split()
    total = len(toks) - 4
    from collections import Counter
    c = Counter(tuple(toks[i : i + 5]) for i in range(total))
    want = sum(v - 1 for v in c.values() if v > 1) / total
    assert r == want


def test_rolling_fingerprint_pinned_values():
    # deterministic 61-bit polynomial hash — pin absolute values so any
    # accidental change to base/modulus is caught
    assert TX.rolling_fingerprint("") == 0
    assert TX.rolling_fingerprint("a") == 97
    assert TX.rolling_fingerprint("ab") == 97 * 257 + 98
    h = TX.rolling_fingerprint("hello world")
    assert 0 <= h < (1 << 61) - 1
    assert h == TX.rolling_fingerprint("hello world")  # stable
    assert h != TX.rolling_fingerprint("hello worle")


def test_quality_features_values():
    f = TX.quality_features("The cat, the hat!")
    assert f["n_tokens"] == 4.0
    assert f["n_chars"] == 17.0
    assert f["punct_ratio"] == 2 / 17
    assert f["stopword_ratio"] == 2 / 4  # 'The' + 'the'
    assert f["mean_word_len"] == (3 + 4 + 3 + 4) / 4
    z = TX.quality_features("")
    assert z["n_tokens"] == 0.0 and z["punct_ratio"] == 0.0


def test_shingles():
    assert TX.shingles("a b c d e f", k=5) == ["a b c d e", "b c d e f"]
    assert TX.shingles("a b", k=5) == ["a b"]
    assert TX.shingles("", k=5) == []


def test_unigram_perplexity_matches_pure_python_oracle(spark, tmp_path):
    """F10 twin: the Spark unigram-LM perplexity equals an independent
    pure-Python computation (count -> p -> exp(-mean(ln p))) on a corpus
    small enough to enumerate, including the degenerate-repetition
    property a perplexity quality filter exists for."""
    import math

    from news_crawler_slm_spark.plans.catalog import REGISTRY

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the the the the the the"),  # degenerate: should score lowest
        (2, "quantum flux perturbs the manifold"),
        (3, "cat mat sat the on the"),  # permutation of doc 0
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    fn, _ = REGISTRY["unigram_perplexity"]
    got = {r["doc_id"]: (r["n_tokens"], r["perplexity"]) for r in fn(spark, str(tmp_path)).collect()}

    counts: dict[str, int] = {}
    for _, t in docs:
        for tok in t.lower().split():
            counts[tok] = counts.get(tok, 0) + 1
    total = sum(counts.values())
    for i, t in docs:
        toks = t.lower().split()
        ppl = math.exp(-sum(math.log(counts[w] / total) for w in toks) / len(toks))
        assert got[i][0] == len(toks)
        assert got[i][1] == round(ppl, 4)

    # permutation invariance + repetition scores strictly lowest
    assert got[0][1] == got[3][1]
    assert got[1][1] < min(got[0][1], got[2][1], got[3][1])


def test_doc_fingerprints_rolling_edges_and_pins(spark, tmp_path):
    """Rolling Rabin-Karp fingerprint: pure-Python fold oracle, plus the
    edge semantics the DuckDB twin must share (short docs -> one truncated
    window; empty text -> hash 0; repeated shingles collapse in
    distinct_fps but not n_windows)."""
    from news_crawler_slm_spark.plans.catalog import REGISTRY

    P = 1000000007

    def rk(s: str) -> int:
        a = 0
        for ch in s:
            a = (a * 257 + ord(ch)) % P
        return a

    docs = [
        (0, "a b c d"),  # 2 windows: "a b c", "b c d"
        (1, "a b"),  # short: one truncated window "a b"
        (2, ""),  # empty: one window "" -> 0
        (3, "x y x y x y"),  # repetition: 4 windows, 2 distinct
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    fn, _ = REGISTRY["doc_fingerprints_rolling"]
    got = {r["doc_id"]: (r["n_windows"], r["min_fp"], r["distinct_fps"]) for r in fn(spark, str(tmp_path)).collect()}

    assert got[0] == (2, min(rk("a b c"), rk("b c d")), 2)
    assert got[1] == (1, rk("a b"), 1)
    assert got[2] == (1, 0, 1)
    assert got[3] == (4, min(rk("x y x"), rk("y x y")), 2)


def test_benchmark_decontamination_regex_windows(spark, tmp_path):
    """The regex window construction must share the oracle's semantics on
    edges: irregular whitespace collapses, short docs yield one truncated
    window, and overlap counting uses distinct windows."""
    from news_crawler_slm_spark.plans.catalog import REGISTRY

    docs = [
        (0, "alpha beta gamma delta epsilon"),       # benchmark doc (0 % 97 == 0)
        (1, "x alpha  beta\tgamma   delta y"),        # irregular ws, shares 1 window
        (2, "alpha beta gamma delta epsilon zeta"),  # shares 2 distinct windows
        (3, "zeta eta theta iota"),                   # no overlap
        (4, "alpha beta"),                            # short, no 4-window overlap
    ]
    spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    fn, _ = REGISTRY["benchmark_decontamination"]
    got = {r["doc_id"]: r["n_shared"] for r in fn(spark, str(tmp_path)).collect()}
    assert got == {1: 1, 2: 2}


def test_word_windows_property_matches_pure_python(spark):
    """Property: the regexp window construction equals the reference
    sliding-window semantics for arbitrary token sequences and messy
    whitespace (hypothesis-driven, one Spark job for all cases)."""
    from hypothesis import given, settings, strategies as st

    from news_crawler_slm_spark.plans.catalog import word_windows, ws_normalize
    from pyspark.sql import functions as F

    token = st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
        min_size=1,
        max_size=6,
    )
    ws = st.sampled_from([" ", "  ", "\t", " \t ", "\n"])
    cases = []

    @settings(max_examples=60, deadline=None)
    @given(st.lists(token, min_size=0, max_size=9), st.lists(ws, min_size=12, max_size=12), st.integers(2, 5))
    def collect(tokens, seps, k):
        text = "".join(t + s for t, s in zip(tokens, seps))
        cases.append((len(cases), text, k))

    collect()

    df = spark.createDataFrame(cases, "i long, text string, k int")
    got = {}
    for k in (2, 3, 4, 5):
        sub = df.where(F.col("k") == k)
        rows = sub.select("i", word_windows(ws_normalize(F.col("text")), k).alias("w")).collect()
        got.update({r["i"]: list(r["w"]) for r in rows})
    for i, text, k in cases:
        toks = text.split()
        want = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        assert got[i] == want, (text, k, got[i], want)


# --------------------------------------------------- unicode normalization

def _mojibake(s: str, passes: int = 1) -> str:
    """Damage a clean string the way the wild does: UTF-8 bytes decoded as
    latin-1 (C1 chars appear verbatim), `passes` times."""
    for _ in range(passes):
        s = s.encode("utf-8").decode("latin-1")
    return s


def test_repair_mojibake_crafted_pairs():
    from news_crawler_slm_spark.functions.normalize import repair_mojibake

    clean = ["Café crème", "naïve — dash", "“quoted”", "€99 œuvre"]
    for c in clean:
        assert repair_mojibake(_mojibake(c)) == c, c
        # double-encoded unwraps too (one layer per pass)
        assert repair_mojibake(_mojibake(c, 2)) == c, c

    # untouched classes: pure ASCII, legitimately-accented text, and a lone
    # marker char whose "repair" would not round-trip as UTF-8
    for s in ["clean ascii text", "Café crème", "Ã"]:
        assert repair_mojibake(s) == s, s


def test_strip_accents_nfc_composed_equals_decomposed():
    import unicodedata

    from news_crawler_slm_spark.functions.normalize import strip_accents_nfc

    composed = "école déjà vü"
    decomposed = unicodedata.normalize("NFD", composed)
    assert composed != decomposed  # the dedup-defeating representation split
    assert strip_accents_nfc(composed) == strip_accents_nfc(decomposed) == "ecole deja vu"
    # non-decomposable letters pass through (ICU-less strip_accents behavior)
    assert strip_accents_nfc("øđ") == "øđ"


def test_normalize_udfs_match_pure_functions(spark):
    from news_crawler_slm_spark.functions import normalize as NZ
    from news_crawler_slm_spark.functions.udfs import (
        repair_mojibake_udf,
        strip_accents_nfc_udf,
    )

    rows = [
        _mojibake("Café crème"),
        _mojibake("“quoted”", 2),
        "école",
        "plain",
        "",
    ]
    df = spark.createDataFrame([(i, s) for i, s in enumerate(rows)], ["i", "text"])
    got = {
        r["i"]: (r["m"], r["a"])
        for r in df.select(
            "i",
            repair_mojibake_udf("text").alias("m"),
            strip_accents_nfc_udf("text").alias("a"),
        ).collect()
    }
    for i, s in enumerate(rows):
        assert got[i] == (NZ.repair_mojibake(s), NZ.strip_accents_nfc(s)), s


def test_nb_lang_classifier_learns_separable_vocab(spark, tmp_path):
    """Learning contract on a corpus NB must ace: three languages with
    disjoint vocabularies plus shared filler. Every doc classified
    correctly, despite a skewed prior that a prior-only classifier would
    follow onto the minority classes' docs."""
    from news_crawler_slm_spark.plans.catalog import REGISTRY

    vocab = {
        "aa": ["alpha", "arch", "atom"],
        "bb": ["beta", "bloom", "brink"],
        "cc": ["gamma", "glade", "grove"],
    }
    docs = []
    i = 0
    # skewed: 12 aa docs, 4 bb, 4 cc — priors alone would call everything aa
    for lang, n in (("aa", 12), ("bb", 4), ("cc", 4)):
        for k in range(n):
            toks = ["filler", "common"] + vocab[lang] * (2 + k % 3)
            docs.append((i, " ".join(toks), lang))
            i += 1
    spark.createDataFrame(
        [(d, t, l, "s0", len(t)) for d, t, l in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    fn, _ = REGISTRY["nb_lang_classifier"]
    rows = {r["doc_id"]: r for r in fn(spark, str(tmp_path)).collect()}
    assert len(rows) == len(docs)
    truth = {d: l for d, _, l in docs}
    assert all(r["pred_lang"] == truth[d] and r["correct"] == 1 for d, r in rows.items())


# ---------------------------------------------------------------------------
# Size-aware per-group rank dispatch (operators/rank.py:grouped_row_number)
# ---------------------------------------------------------------------------


def _skewed_groups(spark, n=1200, hot_frac=0.9):
    """Planted 90%-one-group frame: ids 0..n-1, group 'hot' for the first
    90%, the rest spread over 6 cold groups; value column de-correlated
    from id so the rank order is non-trivial."""
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.functions.hashing import knuth_shuffle_key

    hot = int(n * hot_frac)
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 6).cast("string")))
        .alias("g"),
        knuth_shuffle_key(F.col("id")).alias("v"),
    )
    return df


def test_grouped_row_number_window_equals_distributed_on_planted_skew(spark):
    """The two dispatch paths must produce IDENTICAL ranks on a planted
    90%-one-group corpus: threshold above the hot group forces the window
    form, threshold below forces the with_group_rank form."""
    from pyspark.sql import functions as F

    from news_crawler_slm_spark.operators.rank import grouped_row_number

    df = _skewed_groups(spark)
    order = [F.desc("v"), F.col("doc_id")]
    via_window = grouped_row_number(df, ["g"], order, threshold=10**9)
    via_dist = grouped_row_number(df, ["g"], order, threshold=100)
    a = {(r["g"], r["doc_id"]): r["rn"] for r in via_window.collect()}
    b = {(r["g"], r["doc_id"]): r["rn"] for r in via_dist.collect()}
    assert a == b and len(a) == 1200
    # the distributed path really is the range-partitioned plan, and the
    # window path really is a hash-partitioned window — distinct shapes
    dist_plan = via_dist._jdf.queryExecution().executedPlan().toString()
    win_plan = via_window._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in dist_plan
    assert "rangepartitioning" not in win_plan


def test_hot_group_queries_dispatch_equal_results(spark, sf_dir, monkeypatch):
    """The registered weighted_sample_by_source / ccnet_perplexity_buckets
    must return bit-identical rows whichever side of the gate they run on:
    lower the module threshold so the real queries take the distributed
    path on the gate corpus, and compare to the window-path rows."""
    import news_crawler_slm_spark.operators.rank as rank_mod
    from news_crawler_slm_spark.plans import REGISTRY

    for name in ("weighted_sample_by_source", "ccnet_perplexity_buckets"):
        fn = REGISTRY[name][0]
        baseline = {tuple(r) for r in fn(spark, sf_dir).collect()}
        monkeypatch.setattr(rank_mod, "GROUP_RANK_THRESHOLD", 3)
        forced = {tuple(r) for r in fn(spark, sf_dir).collect()}
        monkeypatch.undo()
        assert forced == baseline and len(baseline) > 0, name
