"""Document-quality filter suites from the published web-corpus pipelines
(engine additions; reference analog: the heuristics compute_statistics/*
and filter_dataset.py apply one-at-a-time, here composed as the standard
named rule-sets a 100 TB pretraining pipeline runs per document):

- ``gopher_quality_flags`` — the Gopher word-statistics rules (Rae et al.
  2021, "Scaling Language Models: ... Gopher", Table A1): word-count
  bounds, mean-word-length band, alphabetic-word ratio, stop-word hits,
  symbol-to-word ratio.
- ``top_ngram_char_fraction`` / ``dup_ngram_char_fraction`` — the Gopher
  repetition rule family: characters covered by the single most frequent
  word bigram, and characters inside word 5-grams that repeat within the
  document.
- ``c4_line_filter`` — the C4 line-level cleaning rules (Raffel et al.
  2020): terminal punctuation, minimum words per line, javascript/brace/
  lorem-ipsum blocklists, >= 3 surviving lines per document.

All are pure per-document computations with full DuckDB oracle twins.
``gopher_quality_flags`` is deliberately shuffle-FREE: every statistic is
a per-row Column expression over the token array (no explode), so at
100 TB it is a single codegen'd scan — quality gating must never cost a
shuffle. ``top_ngram_char_fraction`` needs per-(doc, gram) counts, which
is the one quality rule that genuinely requires an explode + local
aggregation; its shuffle key is (doc_id, gram) — high-cardinality, skew-
free by construction (per-doc grams), with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _spread, _t, register, word_windows, ws_normalize


def _docs(spark, sf_dir):
    """The (doc_id, text) scan every quality rule reads, spread across the
    cores when the input is row-group-limited (catalog._spread: no-op on
    any already-split input, so the 100 TB plans stay as documented).
    Without this the whole regex-heavy rule family runs on ONE task over
    the driver's single-row-group tables (r07: gopher 3.3 s -> 0.3 s,
    composite gate 36.2 s -> ~2 s at sf1.0/local[32])."""
    return _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )

# The fixed stop list shared with quality_features (catalog.py) — the
# Gopher rule counts how many DISTINCT stop words appear in the document
# (the paper requires >= 2 of its 8-word list; same shape, our list).
_STOP = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

# Gopher Table A1 bounds (word-stat subset expressible without a tokenizer
# model): 50 <= words <= 100000, 3 <= mean word length <= 10,
# alpha-word ratio > 0.8, >= 2 distinct stop words, symbol-to-word < 0.1.
_MIN_WORDS, _MAX_WORDS = 50, 100_000
_MIN_MWL, _MAX_MWL = 3.0, 10.0
_MIN_ALPHA = 0.8
_MIN_STOP_HITS = 2
_MAX_SYMBOL_RATIO = 0.1

_GOPHER_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w
      FROM documents
    ),
    per AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(length(w)) AS BIGINT) AS word_chars,
             CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END)
                  AS BIGINT) AS alpha_words,
             CAST(count(DISTINCT CASE WHEN lower(w) IN
                    ('the','a','an','and','or','of','to','in','is','it')
                  THEN lower(w) END) AS BIGINT) AS stop_hits
      FROM toks GROUP BY doc_id
    ),
    sym AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT)
               AS symbol_hits
      FROM documents
    )
    SELECT p.doc_id,
           p.n_words,
           round(p.word_chars / CAST(p.n_words AS DOUBLE), 6) AS mean_word_len,
           round(p.alpha_words / CAST(p.n_words AS DOUBLE), 6) AS alpha_ratio,
           p.stop_hits,
           s.symbol_hits,
           (    p.n_words BETWEEN {_MIN_WORDS} AND {_MAX_WORDS}
            AND p.word_chars / CAST(p.n_words AS DOUBLE)
                  BETWEEN {_MIN_MWL} AND {_MAX_MWL}
            AND p.alpha_words / CAST(p.n_words AS DOUBLE) > {_MIN_ALPHA}
            AND p.stop_hits >= {_MIN_STOP_HITS}
            AND s.symbol_hits / CAST(p.n_words AS DOUBLE) < {_MAX_SYMBOL_RATIO}
           ) AS keep
    FROM per p JOIN sym s USING (doc_id)
"""


def _gopher_cols() -> dict[str, F.Column]:
    """The Gopher word statistics as named Columns over a ``text`` column —
    shared by the standalone query and the fused composite-gate leg so the
    two can never drift."""
    ltoks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    word_chars = F.length(F.regexp_replace("text", r"\s+", "")).cast("long")
    alpha_words = F.size(
        F.regexp_extract_all(ws_normalize(F.col("text")), F.lit(r"(\S*[A-Za-z]\S*)"), 1)
    ).cast("long")
    stop_hits = sum(
        F.array_contains(ltoks, s).cast("int") for s in _STOP
    ).cast("long")
    symbol_hits = F.regexp_count("text", F.lit(r"#|\.\.\.")).cast("long")

    mwl = word_chars / n_words.cast("double")
    alpha_ratio = alpha_words / n_words.cast("double")
    keep = (
        n_words.between(_MIN_WORDS, _MAX_WORDS)
        & mwl.between(_MIN_MWL, _MAX_MWL)
        & (alpha_ratio > _MIN_ALPHA)
        & (stop_hits >= _MIN_STOP_HITS)
        & (symbol_hits / n_words.cast("double") < _MAX_SYMBOL_RATIO)
    )
    return {
        "n_words": n_words,
        "mean_word_len": F.round(mwl, 6),
        "alpha_ratio": F.round(alpha_ratio, 6),
        "stop_hits": stop_hits,
        "symbol_hits": symbol_hits,
        "keep": keep,
    }


@register("gopher_quality_flags", _GOPHER_ORACLE)
def gopher_quality_flags(spark, sf_dir):
    """Gopher word-statistics quality rules as ONE shuffle-free projection.

    Cross-engine notes: every ratio divides the same two exact integers on
    both engines (identical IEEE doubles before the display round); the
    keep flag compares the UNROUNDED ratios, which are bit-identical for
    the same reason. ``alpha_words`` counts whitespace-delimited words
    containing an ASCII letter with one regexp_extract_all pass — the
    greedy ``\\S*[A-Za-z]\\S*`` match always extends to the word boundary,
    so each qualifying word matches exactly once (no explode, no HOF
    filter: both alternatives leave whole-stage codegen). ``stop_hits``
    counts DISTINCT stop-list words present via 10 array_contains probes —
    distinct-by-construction, still per-row.

    r07: the rule set stays one codegen'd projection; the only exchange is
    the adaptive input spread (8-byte ids + text, fires only on
    row-group-limited inputs — none at 100 TB).
    """
    d = _docs(spark, sf_dir)
    cols = _gopher_cols()
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


_TOP_NGRAM_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS a,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
               AS nonspace_chars
      FROM documents
    ),
    pairs AS (
      SELECT doc_id, nonspace_chars,
             unnest(list_transform(range(1, len(a)), i -> a[i] || ' ' || a[i+1]))
               AS g
      FROM t WHERE len(a) >= 2
    ),
    gc AS (
      SELECT doc_id, nonspace_chars, g, CAST(count(*) AS BIGINT) AS c
      FROM pairs GROUP BY doc_id, nonspace_chars, g
    ),
    r AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) AS rn
      FROM gc
    )
    SELECT doc_id, g AS top_gram, c AS top_count,
           round(c * length(replace(g, ' ', ''))
                 / CAST(nonspace_chars AS DOUBLE), 6) AS top_gram_char_frac
    FROM r WHERE rn = 1
"""


@register("top_ngram_char_fraction", _TOP_NGRAM_ORACLE)
def top_ngram_char_fraction(spark, sf_dir):
    """Gopher repetition rule: fraction of a document's non-space characters
    covered by its single most frequent word BIGRAM (count x gram chars /
    doc chars; Gopher rejects > 0.2 for 2-grams). Docs with < 2 tokens have
    no bigram and no row — same WHERE on both engines.

    Plan shape: bigrams come from the codegen regexp window (word_windows,
    k=2 — no per-token explode), counted per (doc_id, gram) with map-side
    partial aggregation, then the argmax is a second AGGREGATE —
    min(struct(-c, g)) per doc, the nb_lang_classifier idiom ≡ the
    oracle's row_number ORDER BY c DESC, g — not a window: the partial
    min folds map-side, so the doc-keyed exchange carries one row per doc
    per map partition instead of every distinct gram, and nothing sorts
    (r07: was Sort+WindowGroupLimit+Window). The per-doc char denominator
    rides the rows (computed in the same scan), so no join back to the
    documents table.
    """
    return top_ngram_char_fraction_of(_docs(spark, sf_dir))


def top_ngram_char_fraction_of(d):
    """The top-bigram rule over an arbitrary (doc_id, text) frame — shared
    by the registered query, the composite gate, and the training
    pipeline's composite filter stage."""
    norm = ws_normalize(F.lower(F.col("text")))
    grams = d.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"\s+", "")).cast("long").alias(
            "nonspace_chars"
        ),
        F.explode(word_windows(norm, 2)).alias("g"),
    )
    gc = grams.groupBy("doc_id", "nonspace_chars", "g").agg(F.count("*").alias("c"))
    # argmax by (c DESC, g ASC) == min over struct(-c, g): grams are
    # distinct per doc after the count agg, so the key is total and the
    # row_number()==1 twin is exact.
    top = gc.groupBy("doc_id", "nonspace_chars").agg(
        F.min(F.struct((-F.col("c")).alias("nc"), F.col("g"))).alias("m")
    )
    return top.select(
        "doc_id",
        F.col("m.g").alias("top_gram"),
        (-F.col("m.nc")).alias("top_count"),
        F.round(
            (-F.col("m.nc"))
            * F.length(F.regexp_replace(F.col("m.g"), " ", ""))
            / F.col("nonspace_chars").cast("double"),
            6,
        ).alias("top_gram_char_frac"),
    )


_C4_ORACLE = r"""
    WITH l AS (
      SELECT doc_id,
             list_transform(string_split(text, chr(10)),
                            x -> trim(x, ' ' || chr(9) || chr(13))) AS ls
      FROM documents
    ),
    k AS (
      SELECT doc_id, len(ls) AS n_lines,
             list_filter(ls, x ->
                right(x, 1) IN ('.', '!', '?', '"')
                AND length(regexp_split_to_array(x, '\s+')) >= 5
                AND NOT contains(lower(x), 'javascript')
                AND NOT contains(x, '{')
                AND NOT contains(lower(x), 'lorem ipsum')) AS kept
      FROM l
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           len(kept) >= 3 AS keep_doc,
           md5(coalesce(array_to_string(kept, chr(10)), '')) AS clean_md5
    FROM k
"""


@register("c4_line_filter", _C4_ORACLE)
def c4_line_filter(spark, sf_dir):
    """C4 line-level cleaning rules (Raffel et al. 2020, §2.2): keep a line
    only if it ends in terminal punctuation, has >= 5 words, and contains
    none of 'javascript' (any case), '{', or the 'lorem ipsum' placeholder;
    a document survives (keep_doc) when >= 3 lines remain. Returns per-doc
    line counts plus an md5 of the cleaned text so the gate compares the
    full rebuilt string while the text itself stays distributed (same
    discipline as substring_dedup_clean).

    Plan shape: the whole rule set runs INSIDE the text column's array —
    split / transform / filter higher-order expressions, so zero shuffles
    and zero explodes at any scale (HOF lambdas are CodegenFallback but
    still JVM-side and per-row; the alternative explode + groupBy(doc_id)
    would shuffle every line of a 100 TB corpus). Terminal punctuation is
    a last-char isin — not a '$'-anchored regex, whose multiline semantics
    differ between engines.

    The driver corpus is single-line word-soup (no newlines, no
    punctuation), so every gate row is the degenerate n_kept = 0 case;
    the rule-by-rule behavior on real multi-line text is pinned by the
    crafted fixture in tests/test_quality.py against the same oracle.
    """
    d = _docs(spark, sf_dir)
    cols = _c4_cols()
    return d.select("doc_id", *[c.alias(n) for n, c in cols.items()])


def _c4_cols() -> dict[str, F.Column]:
    """The C4 line-filter outputs as named Columns over a ``text`` column —
    shared by the standalone query and the fused composite-gate leg."""
    # btrim with an explicit whitespace set: plain trim strips only spaces
    # (identically on both engines), but C4 lines are stripped of tabs and
    # carriage returns too
    lines = F.transform(
        F.split(F.col("text"), "\n"), lambda x: F.btrim(x, F.lit(" \t\r"))
    )

    def keep_line(x):
        lx = F.lower(x)
        return (
            F.substring(x, -1, 1).isin(".", "!", "?", '"')
            & (F.size(F.split(x, r"\s+")) >= 5)
            & ~lx.contains("javascript")
            & ~x.contains("{")
            & ~lx.contains("lorem ipsum")
        )

    kept = F.filter(lines, keep_line)
    return {
        "n_lines": F.size(lines).cast("long"),
        "n_kept": F.size(kept).cast("long"),
        "keep_doc": F.size(kept) >= 3,
        "clean_md5": F.md5(F.array_join(kept, "\n")),
    }


_QUANTILES = [0.25, 0.5, 0.75, 0.95, 0.99]

_QUANTILES_ORACLE = rf"""
    WITH tc AS (
      SELECT doc_id, {{tok}} AS token_count FROM documents
    ),
    r AS (
      SELECT tc.*, row_number() OVER (ORDER BY token_count, doc_id) AS rn
      FROM tc
    ),
    n AS (SELECT count(*) AS c FROM tc),
    pos AS (
      SELECT CAST(p AS DOUBLE) AS p, CAST(ceil(p * c) AS BIGINT) AS k
      FROM (VALUES (0.25), (0.5), (0.75), (0.95), (0.99)) v(p) CROSS JOIN n
    )
    SELECT pos.p, r.token_count AS value
    FROM pos JOIN r ON r.rn = pos.k
"""


@register(
    "token_count_quantiles",
    _QUANTILES_ORACLE.format(
        tok="length(regexp_split_to_array(trim(text), '\\s+'))"
    ),
)
def token_count_quantiles(spark, sf_dir):
    """EXACT distributed quantiles of the per-document token count — p25 /
    p50 / p75 / p95 / p99 as value-at-position ceil(p*N) in the total
    (token_count, doc_id) order. Both engines share that elementary
    definition, so no engine-specific quantile function's interpolation
    semantics can diverge (DuckDB quantile_disc and Spark percentile
    disagree on boundary handling; neither appears here).

    Scale shape: the position lookup runs over the engine's distributed
    rank operator (operators/rank.py — range partition + reused exchange,
    refuses to build without exchange reuse) instead of a row_number over
    a SinglePartition window: the sort stays partition-local at any corpus
    size. N and the five positions ride a broadcast 5-row dim; the final
    join filters rank == position inside the scan of the ranked output.
    """
    from ..operators.rank import with_global_rank

    d = _t(spark, sf_dir, "documents")
    tc = d.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long").alias(
            "token_count"
        ),
    )
    ranked = with_global_rank(
        tc, [F.asc("token_count"), F.asc("doc_id")], "rank0"
    ).withColumn("rn", F.col("rank0") + 1)
    n = tc.agg(F.count("*").alias("c"))
    pos = (
        spark.createDataFrame([(p,) for p in _QUANTILES], "p double")
        .crossJoin(F.broadcast(n))
        .select("p", F.ceil(F.col("p") * F.col("c")).cast("long").alias("k"))
    )
    return (
        ranked.join(F.broadcast(pos), ranked.rn == pos.k)
        .select("p", F.col("token_count").alias("value"))
    )


_DUP_NGRAM_ORACLE = r"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS a,
             CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
               AS nonspace_chars
      FROM documents
    ),
    grams AS (
      SELECT doc_id, nonspace_chars,
             unnest(list_transform(range(1, len(a) - 3),
                    i -> a[i] || ' ' || a[i+1] || ' ' || a[i+2] || ' '
                         || a[i+3] || ' ' || a[i+4])) AS g
      FROM t WHERE len(a) >= 5
    ),
    gc AS (
      SELECT doc_id, nonspace_chars, g, CAST(count(*) AS BIGINT) AS c
      FROM grams GROUP BY doc_id, nonspace_chars, g
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
             AS dup_gram_occurrences,
           round(sum(CASE WHEN c > 1 THEN c * length(replace(g, ' ', ''))
                          ELSE 0 END)
                 / CAST(max(nonspace_chars) AS DOUBLE), 6)
             AS dup_char_fraction
    FROM gc GROUP BY doc_id
"""


@register("dup_ngram_char_fraction", _DUP_NGRAM_ORACLE)
def dup_ngram_char_fraction(spark, sf_dir, n: int = 5):
    """Gopher's OTHER repetition rule family: the fraction of document
    characters inside word 5-GRAMS THAT REPEAT within the document
    (occurrence count > 1; every occurrence of a repeated gram counts, the
    paper's duplicate-n-gram character fraction — Gopher rejects > 0.15
    at n=5). Complements ``top_ngram_char_fraction`` (mass of the single
    most frequent bigram vs mass of all repeated 5-grams). Docs shorter
    than n tokens have no gram and no row.

    Plan shape: same as the top-bigram rule — codegen regexp windows (no
    per-token explode), one (doc_id, gram) shuffle with map-side partial
    aggregation, then a per-doc re-aggregation; the char denominator rides
    the rows. Chars are counted gram-internal (spaces excluded) on both
    engines, an overlap-insensitive proxy both engines share exactly.
    """
    return dup_ngram_char_fraction_of(_docs(spark, sf_dir), n=n)


def dup_ngram_char_fraction_of(d, n: int = 5):
    """The duplicate-n-gram rule over an arbitrary (doc_id, text) frame."""
    norm = ws_normalize(F.lower(F.col("text")))
    grams = d.select(
        "doc_id",
        F.length(F.regexp_replace("text", r"\s+", "")).cast("long").alias(
            "nonspace_chars"
        ),
        F.explode(word_windows(norm, n)).alias("g"),
    )
    gc = grams.groupBy("doc_id", "nonspace_chars", "g").agg(F.count("*").alias("c"))
    dup_chars = F.when(
        F.col("c") > 1, F.col("c") * F.length(F.regexp_replace("g", " ", ""))
    ).otherwise(F.lit(0))
    return gc.groupBy("doc_id").agg(
        F.sum("c").alias("n_grams"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias(
            "dup_gram_occurrences"
        ),
        F.round(
            F.sum(dup_chars) / F.max("nonspace_chars").cast("double"), 6
        ).alias("dup_char_fraction"),
    )


_DUP_LINE_ORACLE = r"""
    WITH l AS (
      SELECT doc_id,
             unnest(list_transform(string_split(text, chr(10)),
                    x -> trim(x, ' ' || chr(9) || chr(13)))) AS line
      FROM documents
    ),
    lc AS (
      SELECT doc_id, line, CAST(count(*) AS BIGINT) AS c
      FROM l GROUP BY doc_id, line
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_lines,
           round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
                 / CAST(sum(c) AS DOUBLE), 6) AS dup_line_frac,
           CASE WHEN sum(c * length(line)) = 0 THEN 0.0
                ELSE round(sum(CASE WHEN c > 1 THEN c * length(line)
                               ELSE 0 END)
                           / CAST(sum(c * length(line)) AS DOUBLE), 6)
           END AS dup_line_char_frac
    FROM lc GROUP BY doc_id
"""


@register("dup_line_stats", _DUP_LINE_ORACLE)
def dup_line_stats(spark, sf_dir):
    """The remaining Gopher repetition rules: duplicate-LINE fraction and
    duplicate-line CHARACTER fraction (Rae et al. 2021 Table A1 rejects
    > 0.30 / > 0.20). A line counts as duplicated when it occurs more than
    once within the document (after the same whitespace strip C4's line
    filter uses); every occurrence of a repeated line counts — the same
    all-occurrences convention as ``dup_ngram_char_fraction``. Documents
    whose lines are all empty after the strip get char fraction 0 (the
    0/0 guard is identical on both engines).

    Plan shape: one (doc_id, line) shuffle with map-side partial
    aggregation, then the per-doc re-aggregation — both denominators ride
    the line counts, so a single corpus scan and no join back to documents.
    The driver corpus is single-line, so gate rows pin the degenerate
    no-duplicate case; the rule firing on real multi-line text is pinned by
    the crafted fixture in tests/test_quality.py against this same oracle.
    """
    return dup_line_stats_of(_docs(spark, sf_dir))


def dup_line_stats_of(d):
    """The duplicate-line rules over an arbitrary (doc_id, text) frame."""
    lines = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.split(F.col("text"), "\n"), lambda x: F.btrim(x, F.lit(" \t\r"))
            )
        ).alias("line"),
    )
    lc = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_chars = F.col("c") * F.length("line")
    dup_chars = F.when(F.col("c") > 1, line_chars).otherwise(F.lit(0))
    tot_chars = F.sum(line_chars)
    return lc.groupBy("doc_id").agg(
        F.sum("c").alias("n_lines"),
        F.round(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
            / F.sum("c").cast("double"),
            6,
        ).alias("dup_line_frac"),
        F.when(tot_chars == 0, F.lit(0.0))
        .otherwise(F.round(F.sum(dup_chars) / tot_chars.cast("double"), 6))
        .alias("dup_line_char_frac"),
    )


_COMPOSITE_ORACLE = rf"""
    WITH g AS ({_GOPHER_ORACLE}),
    t AS ({_TOP_NGRAM_ORACLE}),
    n AS ({_DUP_NGRAM_ORACLE}),
    l AS ({_DUP_LINE_ORACLE}),
    c AS ({_C4_ORACLE})
    SELECT g.doc_id,
           g.keep AS gopher_keep,
           (coalesce(t.top_gram_char_frac <= 0.20, TRUE)
            AND coalesce(n.dup_char_fraction <= 0.15, TRUE)
            AND coalesce(l.dup_line_frac <= 0.30
                         AND l.dup_line_char_frac <= 0.20, TRUE))
             AS repetition_keep,
           c.keep_doc AS c4_keep,
           (g.keep
            AND coalesce(t.top_gram_char_frac <= 0.20, TRUE)
            AND coalesce(n.dup_char_fraction <= 0.15, TRUE)
            AND coalesce(l.dup_line_frac <= 0.30
                         AND l.dup_line_char_frac <= 0.20, TRUE)
            AND c.keep_doc) AS keep
    FROM g
    LEFT JOIN t USING (doc_id)
    LEFT JOIN n USING (doc_id)
    LEFT JOIN l USING (doc_id)
    JOIN c USING (doc_id)
"""


@register("composite_quality_gate", _COMPOSITE_ORACLE)
def composite_quality_gate(spark, sf_dir):
    """The full document gate a FineWeb/Dolma-style pipeline runs as ONE
    decision: Gopher word statistics AND the repetition family (top-bigram
    mass <= 0.20, duplicate-5-gram chars <= 0.15, duplicate lines <= 0.30,
    duplicate-line chars <= 0.20 — the published Gopher Table A1 bounds)
    AND the C4 line filter's >= 3-surviving-lines rule. Documents too short
    to have a bigram/5-gram pass those sub-rules vacuously (LEFT join +
    coalesce TRUE — identical on both engines).

    Built BY COMPOSITION: each sub-rule is the already-oracle-twinned
    registered query, joined on doc_id — the oracle nests the sub-oracles
    the same way, so the composite can only disagree with its parts by a
    join bug, which is exactly what this pins. Threshold comparisons run
    on the sub-queries' rounded output columns — the values already proven
    hash-identical cross-engine at sf0.1.

    Plan shape: the two shuffle-free rule sets (Gopher word statistics and
    the C4 line filter) are FUSED into one projection over a single
    documents scan — the expression helpers are shared with the standalone
    queries (_gopher_cols/_c4_cols), so the fusion cannot drift from them.
    The three repetition legs each pay their documented (doc, gram/line)
    shuffle and join back on doc_id: four corpus scans and three joins
    total instead of the naive five and four (plan-shape test pins the
    scan count). Above all, the gate output is MATERIALIZED once per
    corpus version and every downstream consumer reads the bit: a gate is
    computed per document per version, never per query.
    """
    return composite_quality_gate_of(_docs(spark, sf_dir))


def composite_quality_gate_of(d):
    """The composite gate over an arbitrary (doc_id, text) frame — shared
    by the registered query and the training pipeline's filter stage
    (plans/training.py, gate='composite')."""
    g = d.select(
        "doc_id",
        _gopher_cols()["keep"].alias("gopher_keep"),
        _c4_cols()["keep_doc"].alias("c4_keep"),
    )
    t = top_ngram_char_fraction_of(d).select(
        "doc_id", (F.col("top_gram_char_frac") <= 0.20).alias("tk")
    )
    n = dup_ngram_char_fraction_of(d).select(
        "doc_id", (F.col("dup_char_fraction") <= 0.15).alias("nk")
    )
    line = dup_line_stats_of(d).select(
        "doc_id",
        (
            (F.col("dup_line_frac") <= 0.30) & (F.col("dup_line_char_frac") <= 0.20)
        ).alias("lk"),
    )
    rep = (
        F.coalesce(F.col("tk"), F.lit(True))
        & F.coalesce(F.col("nk"), F.lit(True))
        & F.coalesce(F.col("lk"), F.lit(True))
    )
    return (
        g.join(t, "doc_id", "left")
        .join(n, "doc_id", "left")
        .join(line, "doc_id", "left")
        .select(
            "doc_id",
            "gopher_keep",
            rep.alias("repetition_keep"),
            "c4_keep",
            (F.col("gopher_keep") & rep & F.col("c4_keep")).alias("keep"),
        )
    )


_DATACARD_ORACLE = r"""
    WITH base AS (
      SELECT count(*) AS n_docs,
             CAST(sum(length(regexp_split_to_array(trim(text), '\s+')))
                  AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(count(DISTINCT md5(text)) AS BIGINT) AS distinct_texts
      FROM documents
    ),
    lang_h AS (
      SELECT CAST(sum(lp.e) AS BIGINT) AS lang_entropy_micro
      FROM (
        SELECT CAST(round(-(c / CAST(n AS DOUBLE))
                          * ln(c / CAST(n AS DOUBLE)) * 1000000.0, 0)
                    AS BIGINT) AS e
        FROM (SELECT lang, count(*) AS c FROM documents GROUP BY lang),
             (SELECT count(*) AS n FROM documents)
      ) lp
    ),
    g AS (
      SELECT CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
               AS gopher_pass
      FROM ({GOPHER}) gg
    ),
    c AS (
      SELECT CAST(sum(CASE WHEN keep_doc THEN 1 ELSE 0 END) AS BIGINT)
               AS c4_pass
      FROM ({C4}) cc
    )
    SELECT base.*, lang_h.lang_entropy_micro, g.gopher_pass, c.c4_pass,
           CAST(base.n_docs - base.distinct_texts AS BIGINT)
             AS exact_dup_docs
    FROM base, lang_h, g, c
"""


@register(
    "corpus_datacard",
    _DATACARD_ORACLE.replace("{GOPHER}", _GOPHER_ORACLE).replace(
        "{C4}", _C4_ORACLE
    ),
)
def corpus_datacard(spark, sf_dir):
    """The one-row corpus summary a dataset release publishes (the "data
    card" statistics): document/token/source/language counts, exact-dup
    document count (docs minus distinct text md5s), Shannon entropy of the
    language mix, and the Gopher / C4 gate pass counts — one artifact a
    100 TB pipeline recomputes per corpus version and attaches to the
    release.

    Cross-engine discipline: every output is an exact BIGINT except the
    entropy, which quantizes each language's -p·ln p term to integer
    micro-nats INSIDE the |langs|-row dim and sums exactly (the
    temperature-mixing/entropy convention). Plan shape: four independent
    1-row aggregations cross-joined broadcast — the base pass is one scan
    with map-side partial aggregation (count distinct of md5s rides a
    hash re-aggregation, not a text shuffle: only 16-byte digests move);
    the gate legs reuse the shared rule expressions.

    r07: the scan is _spread adaptively (doc_id-hash, no-op on split
    inputs) so the regex-heavy flags leg and the md5 census parallelize on
    row-group-limited inputs; all three legs branch from the SAME
    repartitioned frame, so the exchange is built once and reused.
    """
    d = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text", "source", "lang"),
        "doc_id",
    )
    base = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split(F.trim(F.col("text")), r"\s+"))).cast("long").alias(
            "n_tokens"
        ),
        F.countDistinct("source").alias("n_sources"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct(F.md5("text")).alias("distinct_texts"),
    )
    lc = d.groupBy("lang").agg(F.count("*").alias("c"))
    n = d.agg(F.count("*").alias("n"))
    p = F.col("c") / F.col("n").cast("double")
    lang_h = (
        lc.crossJoin(F.broadcast(n))
        .select(
            F.round(-p * F.log(p) * F.lit(1000000.0), 0).cast("long").alias("e")
        )
        .agg(F.sum("e").alias("lang_entropy_micro"))
    )
    flags = d.select(
        _gopher_cols()["keep"].alias("gk"), _c4_cols()["keep_doc"].alias("ck")
    ).agg(
        F.sum(F.when(F.col("gk"), 1).otherwise(0)).cast("long").alias("gopher_pass"),
        F.sum(F.when(F.col("ck"), 1).otherwise(0)).cast("long").alias("c4_pass"),
    )
    return (
        base.crossJoin(F.broadcast(lang_h))
        .crossJoin(F.broadcast(flags))
        .select(
            "*",
            (F.col("n_docs") - F.col("distinct_texts")).cast("long").alias(
                "exact_dup_docs"
            ),
        )
    )
