"""Evaluation-metrics dataflow catalog (reference: evaluation/evaluate_model.py
+ omit_degeneration.py — SURVEY.md §3.3). The GPU generate step is out of
engine scope; these ops reproduce the dataflow around it: per-row metric
computation (F6-F9), lax JSON validation + field scoring (F11, F15), and the
mean/stddev_pop roll-ups (A9-A10).

Gold/pred pairs are synthesized deterministically from the ``documents``
table (no external data): gold = sanitized text prefix + typed fields; pred
= per-``doc_id % 5`` perturbation hitting every scoring branch (identical
values / strict-JSON null / missing key + hallucination / extra key + type
mismatch / unparseable). The Spark path computes scores by REALLY parsing
and scoring with the reference semantics; the DuckDB oracle knows the
construction and derives the same scores arithmetically — so a semantic
drift in parse/scoring shows up as a hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.udfs import (
    bleu_udf,
    damerau_osa_udf,
    damerau_udf,
    jaro_winkler_udf,
    json_eval_udf,
    meteor_udf,
    rouge_l_udf,
)
from .catalog import _spread, _t, register

# sanitized, quote-free text prefix — safe to embed in literal strings
_TITLE_SPARK = "regexp_replace(lower(substring(text, 1, 16)), '[^a-z0-9 ]', '')"
_TITLE_DUCK = "regexp_replace(lower(substring(text, 1, 16)), '[^a-z0-9 ]', '', 'g')"


def _with_texts(spark, sf_dir):
    """gold_text = sanitized prefix; pred_text varies by doc_id % 4 —
    0/2 (even): first two words swapped (word-level transposition, high
    similarity); 1: character-reversed gold (LOW similarity — exercises the
    jaro>0.7 Winkler-boost gate, see ADVICE r1); 3: unchanged. All three
    branches expressible in SQL for the oracle."""
    d = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", F.expr(_TITLE_SPARK).alias("gold_text"))
    toks = F.split("gold_text", " ")
    swapped = F.concat_ws(
        " ",
        F.concat(
            F.array(F.element_at(toks, 2), F.element_at(toks, 1)),
            F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
        ),
    )
    m4 = F.col("doc_id") % 4
    return d.withColumn(
        "pred_text",
        F.when(m4 == 1, F.reverse("gold_text"))
        .when((m4 % 2 == 0) & (F.size(toks) >= 2), swapped)
        .otherwise(F.col("gold_text")),
    )


_TEXTS_DUCK = f"""
    WITH t AS (
      SELECT doc_id, {_TITLE_DUCK} AS gold_text,
             regexp_split_to_array({_TITLE_DUCK}, ' ') AS toks
      FROM documents
    ), tx AS (
      SELECT doc_id, gold_text,
             CASE WHEN doc_id % 4 = 1 THEN reverse(gold_text)
                  WHEN doc_id % 2 = 0 AND len(toks) >= 2
                  THEN array_to_string(list_concat([toks[2], toks[1]], toks[3:]), ' ')
                  ELSE gold_text END AS pred_text
      FROM t
    )
"""


@register(
    "edit_distance_metrics",
    _TEXTS_DUCK
    + """
    SELECT doc_id,
           levenshtein(pred_text, gold_text) AS lev,
           round(CASE WHEN greatest(length(pred_text), length(gold_text)) = 0 THEN 0.0
                 ELSE levenshtein(pred_text, gold_text)
                      / CAST(greatest(length(pred_text), length(gold_text)) AS DOUBLE)
                 END, 6) AS lev_norm,
           round(CAST(jaro_winkler_similarity(pred_text, gold_text) AS DOUBLE), 6)
             AS jaro_winkler,
           damerau_levenshtein(pred_text, gold_text) AS damerau_dl
    FROM tx
    """,
)
def edit_distance_metrics(spark, sf_dir):
    """F6 (built-in levenshtein + normalization, evaluate_model.py:108-109),
    F8 (Jaro-Winkler, :113 — boost gated on jaro > 0.7, verified char-exact
    against DuckDB including the low-similarity reversed pairs), and the
    UNRESTRICTED Damerau-Levenshtein (DuckDB's definition) as an
    oracle-checked twin for the transposition-aware family; the reference's
    restricted OSA variant is covered by seq_similarity_metrics."""
    t = _with_texts(spark, sf_dir)
    mx = F.greatest(F.length("pred_text"), F.length("gold_text"))
    return t.select(
        "doc_id",
        F.levenshtein("pred_text", "gold_text").alias("lev"),
        F.round(
            F.when(mx == 0, F.lit(0.0)).otherwise(
                F.levenshtein("pred_text", "gold_text") / mx.cast("double")
            ),
            6,
        ).alias("lev_norm"),
        F.round(jaro_winkler_udf("pred_text", "gold_text"), 6).alias("jaro_winkler"),
        damerau_udf("pred_text", "gold_text").alias("damerau_dl"),
    )


# pred = gold + ' qzj' for even doc_ids ('qzj' is outside the corpus vocab),
# pred = gold for odd. With k = gold token count and L = gold char length,
# every metric has a closed form the oracle derives while the Spark side
# REALLY computes it (functions/metrics.py):
#   rouge_l: LCS(T, T+[x]) = k -> prec k/(k+1), rec 1 -> f1 = 2p/(p+1)
#   bleu:    the single n-gram window containing the appended token is the
#            only unmatched one -> prec_n = (k-n+1)/(k-n+2), bp = 1; 0 if k<4
#   osa damerau: 4 pure insertions (' qzj')
#   meteor:  'qzj' is outside the vocab (and no corpus token STEMS to it),
#            so m = k exact matches, all contiguous -> chunks = 1:
#            P = k/(k+1) (1.0 if identical), R = 1,
#            fmean = P*R/(0.9P + (1-0.9)R), penalty = 0.5*(1/k)^3,
#            score = (1-penalty)*fmean; 0.0 when k = 0
# Identical pairs hit the exact fixed points 1.0/0.0. The SQL replicates the
# engine's float op ORDER so doubles are bit-identical before rounding.
_SEQ_DUCK = f"""
    WITH t AS (
      SELECT doc_id, {_TITLE_DUCK} AS gold_text,
             len(regexp_extract_all({_TITLE_DUCK}, '[a-z0-9]+')) AS k
      FROM documents
    ), m AS (
      SELECT doc_id, k, doc_id % 2 = 0 AS appended FROM t
    )
    SELECT doc_id,
           CASE WHEN appended THEN 4 ELSE 0 END AS damerau_osa,
           round(CASE
             WHEN k = 0 THEN 0.0
             WHEN NOT appended THEN 1.0
             ELSE 2 * (CAST(k AS DOUBLE)/(k+1)) * 1.0
                  / ((CAST(k AS DOUBLE)/(k+1)) + 1.0)
           END, 6) AS rouge_l,
           round(CASE
             WHEN k < 4 THEN 0.0
             WHEN NOT appended THEN 1.0
             ELSE exp(ln(CAST(k AS DOUBLE)/(k+1))/4 + ln(CAST(k-1 AS DOUBLE)/k)/4
                    + ln(CAST(k-2 AS DOUBLE)/(k-1))/4 + ln(CAST(k-3 AS DOUBLE)/(k-2))/4)
           END, 6) AS bleu,
           round(CASE
             WHEN k = 0 THEN 0.0
             WHEN NOT appended THEN
               (1 - 0.5 * pow(1.0/k, 3.0))
               * ((1.0 * 1.0) / (0.9 * 1.0 + (1.0 - 0.9) * 1.0))
             ELSE
               (1 - 0.5 * pow(1.0/k, 3.0))
               * (((CAST(k AS DOUBLE)/(k+1)) * 1.0)
                  / (0.9 * (CAST(k AS DOUBLE)/(k+1)) + (1.0 - 0.9) * 1.0))
           END, 6) AS meteor
    FROM m
"""


@register("seq_similarity_metrics", _SEQ_DUCK)
def seq_similarity_metrics(spark, sf_dir):
    """F7 (RESTRICTED Damerau-Levenshtein / OSA — matching the reference's
    pyxdameraulevenshtein import, evaluate_model.py:12) and F9 (Rouge-L F1 +
    BLEU + METEOR, evaluate_model.py:99-111; METEOR = exact + Porter-stem
    stages, WordNet stage omitted offline — functions/metrics.py).
    Oracle-checked via an append-one-token construction with closed-form
    metric values (see _SEQ_DUCK)."""
    t = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    ).select("doc_id", F.expr(_TITLE_SPARK).alias("gold_text"))
    t = t.withColumn(
        "pred_text",
        F.when(F.col("doc_id") % 2 == 0, F.concat("gold_text", F.lit(" qzj")))
        .otherwise(F.col("gold_text")),
    )
    return t.select(
        "doc_id",
        damerau_osa_udf("pred_text", "gold_text").alias("damerau_osa"),
        F.round(rouge_l_udf("pred_text", "gold_text"), 6).alias("rouge_l"),
        F.round(bleu_udf("pred_text", "gold_text"), 6).alias("bleu"),
        F.round(meteor_udf("pred_text", "gold_text"), 6).alias("meteor"),
    )


def _with_json_pairs(spark, sf_dir):
    """gold dict {title, n, tags, note:None, body:{headline, wc, ok}} + pred
    string per doc_id % 5:
    0: python-literal syntax, tags reversed (set-equal), body identical
       -> TP=4, body FP/FN +0, body metrics at identical-text fixed points
    1: strict JSON with null (to_json)  -> literal_eval REJECTS -> invalid
    2: missing n AND missing body + hallucinated note -> TP=2 FP=1 FN=2
    3: extra key + n as string + body with 'ok' bool->int type mismatch and
       headline + ' qzj' (closed-form text metrics) -> TP=3 FP=3 FN=2
    4: unparseable                      -> invalid
    The body branch is the reference's most complex scoring path
    (evaluate_model.py:158-205): subkey/type walk + 5 text metrics over
    extract_all_text; cases 0 and 3 execute it distributively with
    oracle-derivable values.
    """
    d = _spread(
        _t(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text", "n_chars"
        ),
        "doc_id",
    ).select(
        "doc_id",
        "lang",
        "source",
        F.expr(_TITLE_SPARK).alias("title"),
        F.col("n_chars").alias("n"),
    )
    gold = F.to_json(
        F.struct(
            F.col("title"),
            F.col("n"),
            F.array("lang", "source").alias("tags"),
            F.lit(None).cast("string").alias("note"),
            F.struct(
                F.col("title").alias("headline"),
                F.col("n").alias("wc"),
                F.lit(True).alias("ok"),
            ).alias("body"),
        ),
        {"ignoreNullFields": "false"},
    )
    m = F.col("doc_id") % 5
    pred = (
        F.when(
            m == 0,
            F.format_string(
                "{'title': '%s', 'n': %d, 'tags': ['%s', '%s'], 'note': None, "
                "'body': {'headline': '%s', 'wc': %d, 'ok': True}}",
                "title", "n", "source", "lang", "title", "n",
            ),
        )
        .when(m == 1, gold)
        .when(
            m == 2,
            F.format_string(
                "{'title': '%s', 'tags': ['%s', '%s'], 'note': 'surprise'}",
                "title", "lang", "source",
            ),
        )
        .when(
            m == 3,
            F.format_string(
                "{'title': '%s', 'n': '%d', 'tags': ['%s', '%s'], 'note': None, "
                "'bogus': 1, 'body': {'headline': '%s qzj', 'wc': %d, 'ok': 1}}",
                "title", "n", "lang", "source", "title", "n",
            ),
        )
        .otherwise(F.lit("not a dict {"))
    )
    return d.select("doc_id", gold.alias("gold_json"), pred.alias("pred"))


# the oracle derives scores from the construction (comments in
# _with_json_pairs); the Spark side must reproduce them by real parsing.
# body text metrics: case 0 = identical-text fixed points; case 3 = the
# append-' qzj' closed forms (same derivation as _SEQ_DUCK, plus
# levenshtein 4/(L+4) and DuckDB's own jaro_winkler for the jw twin).
_SCORES_DUCK = f"""
    WITH t AS (
      SELECT doc_id, {_TITLE_DUCK} AS ttl,
             length({_TITLE_DUCK}) AS L,
             len(regexp_extract_all({_TITLE_DUCK}, '[a-z0-9]+')) AS k
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN doc_id % 5 IN (0, 2, 3) THEN 1 ELSE 0 END AS valid_json,
           CASE doc_id % 5 WHEN 0 THEN 4 WHEN 2 THEN 2 WHEN 3 THEN 3 ELSE 0 END AS tp,
           CASE doc_id % 5 WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 3 ELSE 0 END AS fp,
           CASE doc_id % 5 WHEN 0 THEN 0 WHEN 2 THEN 2 WHEN 3 THEN 2 ELSE 0 END AS fn,
           round(CASE
             WHEN doc_id % 5 = 0 THEN CASE WHEN k > 0 THEN 1.0 ELSE 0.0 END
             WHEN doc_id % 5 = 3 THEN CASE WHEN k = 0 THEN 0.0
               ELSE 2 * (CAST(k AS DOUBLE)/(k+1)) * 1.0
                    / ((CAST(k AS DOUBLE)/(k+1)) + 1.0) END
             ELSE NULL END, 6) AS body_rouge_l,
           round(CASE
             WHEN doc_id % 5 = 0 THEN CASE WHEN k >= 4 THEN 1.0 ELSE 0.0 END
             WHEN doc_id % 5 = 3 THEN CASE WHEN k < 4 THEN 0.0
               ELSE exp(ln(CAST(k AS DOUBLE)/(k+1))/4 + ln(CAST(k-1 AS DOUBLE)/k)/4
                      + ln(CAST(k-2 AS DOUBLE)/(k-1))/4 + ln(CAST(k-3 AS DOUBLE)/(k-2))/4)
               END
             ELSE NULL END, 6) AS body_bleu,
           round(CASE
             WHEN doc_id % 5 = 0 THEN CASE WHEN k = 0 THEN 0.0
               ELSE (1 - 0.5 * pow(1.0/k, 3.0))
                    * ((1.0 * 1.0) / (0.9 * 1.0 + (1.0 - 0.9) * 1.0)) END
             WHEN doc_id % 5 = 3 THEN CASE WHEN k = 0 THEN 0.0
               ELSE (1 - 0.5 * pow(1.0/k, 3.0))
                    * (((CAST(k AS DOUBLE)/(k+1)) * 1.0)
                       / (0.9 * (CAST(k AS DOUBLE)/(k+1)) + (1.0 - 0.9) * 1.0)) END
             ELSE NULL END, 6) AS body_meteor,
           round(CASE WHEN doc_id % 5 = 0 THEN 0.0
                      WHEN doc_id % 5 = 3 THEN 4 / CAST(L + 4 AS DOUBLE)
                      ELSE NULL END, 6) AS body_lev,
           round(CAST(CASE WHEN doc_id % 5 = 0 THEN 0.0
                           WHEN doc_id % 5 = 3 THEN 4.0
                           ELSE NULL END AS DOUBLE), 6) AS body_damerau,
           round(CASE WHEN doc_id % 5 = 0 THEN 1.0
                      WHEN doc_id % 5 = 3 THEN
                        CAST(jaro_winkler_similarity(ttl || ' qzj', ttl) AS DOUBLE)
                      ELSE NULL END, 6) AS body_jw
    FROM t
"""


@register(
    "json_key_set_ops",
    """
    WITH k AS (
      SELECT doc_id,
             ['title', 'n', 'tags', 'note'] AS gold_keys,
             CASE doc_id % 3
               WHEN 0 THEN ['note', 'tags', 'n', 'title']
               WHEN 1 THEN ['title', 'tags', 'note', 'bogus']
               ELSE        ['title', 'n', 'x', 'y'] END AS pred_keys,
             [lang, source, lang] AS tags
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_filter(pred_keys,
             x -> NOT list_contains(gold_keys, x))), ','), '') AS extra_keys,
           coalesce(array_to_string(list_sort(list_filter(gold_keys,
             x -> NOT list_contains(pred_keys, x))), ','), '') AS missing_keys,
           array_to_string(list_sort(list_intersect(pred_keys, gold_keys)), ',')
             AS common_keys,
           array_to_string(list_sort(list_distinct(tags)), ',') AS uniq_tags
    FROM k
    """,
)
def json_key_set_ops(spark, sf_dir):
    """U2/U3 — the reference's key-set algebra (get_key_sets,
    evaluate_model.py:44-51: pred-gold / gold-pred / intersection; list
    set-equality via set(), :208-214) as JVM Column expressions:
    array_except / array_intersect / array_sort(array_distinct()). The
    Python-UDF path in evaluate_json uses real set() on parsed JSON; this is
    the native-expression twin the OPERATORS.md U2/U3 rows point at."""
    d = _t(spark, sf_dir, "documents")
    gold = F.array(*[F.lit(x) for x in ("title", "n", "tags", "note")])
    m = F.col("doc_id") % 3
    pred = (
        F.when(m == 0, F.array(*[F.lit(x) for x in ("note", "tags", "n", "title")]))
        .when(m == 1, F.array(*[F.lit(x) for x in ("title", "tags", "note", "bogus")]))
        .otherwise(F.array(*[F.lit(x) for x in ("title", "n", "x", "y")]))
    )
    tags = F.array("lang", "source", "lang")
    return d.select(
        "doc_id",
        F.array_join(F.array_sort(F.array_except(pred, gold)), ",").alias("extra_keys"),
        F.array_join(F.array_sort(F.array_except(gold, pred)), ",").alias("missing_keys"),
        F.array_join(F.array_sort(F.array_intersect(pred, gold)), ",").alias("common_keys"),
        F.array_join(F.array_sort(F.array_distinct(tags)), ",").alias("uniq_tags"),
    )


@register("json_eval_scores", _SCORES_DUCK)
def json_eval_scores(spark, sf_dir):
    """F11 + F12 + F15 — lax parse (python-literal laxity incl. strict-JSON
    null REJECTION) and per-field TP/FP/FN scoring with the reference's
    branch order, as one struct-returning Arrow UDF — including the body
    subkey/type walk and all six body text-similarity metrics
    (evaluate_model.py:158-205, incl. METEOR), computed distributively."""
    pairs = _with_json_pairs(spark, sf_dir)
    s = pairs.select(
        "doc_id", json_eval_udf("pred", "gold_json").alias("s")
    )
    return s.select(
        "doc_id", "s.valid_json", "s.tp", "s.fp", "s.fn",
        F.round("s.body_rouge_l", 6).alias("body_rouge_l"),
        F.round("s.body_bleu", 6).alias("body_bleu"),
        F.round("s.body_meteor", 6).alias("body_meteor"),
        F.round("s.body_lev", 6).alias("body_lev"),
        F.round("s.body_damerau", 6).alias("body_damerau"),
        F.round("s.body_jw", 6).alias("body_jw"),
    )


@register(
    "json_eval_rollup",
    f"""
    WITH s AS ({_SCORES_DUCK}),
    v AS (
      SELECT CASE WHEN tp + fp > 0 THEN tp / CAST(tp + fp AS DOUBLE) ELSE 0.0 END AS p,
             CASE WHEN tp + fn > 0 THEN tp / CAST(tp + fn AS DOUBLE) ELSE 0.0 END AS r
      FROM s WHERE valid_json = 1
    ), f AS (
      SELECT p, r, CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END AS f1 FROM v
    )
    SELECT round(avg(p), 6) AS mean_precision,
           round(avg(r), 6) AS mean_recall,
           round(avg(f1), 6) AS mean_f1,
           round(stddev_pop(p), 6) AS std_precision,
           round(stddev_pop(r), 6) AS std_recall,
           round(stddev_pop(f1), 6) AS std_f1,
           (SELECT round(avg(valid_json), 6) FROM s) AS valid_json_rate
    FROM f
    """,
)
def json_eval_rollup(spark, sf_dir):
    """A10 — P/R/F1 with 0-division guards over valid-JSON rows, mean +
    POPULATION stddev (np.std ddof=0, evaluate_model.py:228-266, 384-395),
    plus Valid-JSON rate over ALL rows."""
    s = json_eval_scores(spark, sf_dir)
    p = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    r = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    prf = s.select(
        "valid_json", p.alias("p"), r.alias("r")
    ).withColumn(
        "f1",
        F.when(F.col("p") + F.col("r") > 0, 2 * F.col("p") * F.col("r") / (F.col("p") + F.col("r"))).otherwise(0.0),
    )
    # ONE aggregation pass (r07): the valid-rows stats and the all-rows
    # valid-JSON rate were two separate aggregates cross-joined, so the
    # JSON-parsing upstream ran twice; avg/stddev_pop skip NULLs, so
    # when(valid, x) inside one agg is exactly the filtered aggregate.
    v = F.col("valid_json") == 1
    return prf.agg(
        F.round(F.avg(F.when(v, F.col("p"))), 6).alias("mean_precision"),
        F.round(F.avg(F.when(v, F.col("r"))), 6).alias("mean_recall"),
        F.round(F.avg(F.when(v, F.col("f1"))), 6).alias("mean_f1"),
        F.round(F.stddev_pop(F.when(v, F.col("p"))), 6).alias("std_precision"),
        F.round(F.stddev_pop(F.when(v, F.col("r"))), 6).alias("std_recall"),
        F.round(F.stddev_pop(F.when(v, F.col("f1"))), 6).alias("std_f1"),
        F.round(F.avg("valid_json"), 6).alias("valid_json_rate"),
    )
