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
    damerau_udf,
    jaro_winkler_udf,
    json_eval_udf,
    rouge_l_udf,
)
from .catalog import _t, register

# sanitized, quote-free text prefix — safe to embed in literal strings
_TITLE_SPARK = "regexp_replace(lower(substring(text, 1, 16)), '[^a-z0-9 ]', '')"
_TITLE_DUCK = "regexp_replace(lower(substring(text, 1, 16)), '[^a-z0-9 ]', '', 'g')"


def _with_texts(spark, sf_dir):
    """gold_text = sanitized prefix; pred_text = same with the first two
    words swapped for even doc_ids (word-level transposition), unchanged for
    odd — both expressible in SQL for the oracle."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_TITLE_SPARK).alias("gold_text")
    )
    toks = F.split("gold_text", " ")
    swapped = F.concat_ws(
        " ",
        F.concat(
            F.array(F.element_at(toks, 2), F.element_at(toks, 1)),
            F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0))),
        ),
    )
    return d.withColumn(
        "pred_text",
        F.when((F.col("doc_id") % 2 == 0) & (F.size(toks) >= 2), swapped).otherwise(
            F.col("gold_text")
        ),
    )


_TEXTS_DUCK = f"""
    WITH t AS (
      SELECT doc_id, {_TITLE_DUCK} AS gold_text,
             regexp_split_to_array({_TITLE_DUCK}, ' ') AS toks
      FROM documents
    ), tx AS (
      SELECT doc_id, gold_text,
             CASE WHEN doc_id % 2 = 0 AND len(toks) >= 2
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
             AS jaro_winkler
    FROM tx
    """,
)
def edit_distance_metrics(spark, sf_dir):
    """F6 (built-in levenshtein + normalization, evaluate_model.py:108-109)
    and F8 (Jaro-Winkler, :113 — engine implementation verified char-exact
    against DuckDB's)."""
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
    )


@register("seq_similarity_metrics", None)  # no DuckDB twins for DL/Rouge/BLEU
def seq_similarity_metrics(spark, sf_dir):
    """F7 (Damerau-Levenshtein), F9 (Rouge-L F1 + BLEU) — self-contained
    implementations of the reference's library calls (evaluate_model.py:
    99-111); METEOR is explicitly gated (functions/metrics.py)."""
    t = _with_texts(spark, sf_dir)
    return t.select(
        "doc_id",
        damerau_udf("pred_text", "gold_text").alias("damerau"),
        F.round(rouge_l_udf("pred_text", "gold_text"), 6).alias("rouge_l"),
        F.round(bleu_udf("pred_text", "gold_text"), 6).alias("bleu"),
    )


def _with_json_pairs(spark, sf_dir):
    """gold dict {title, n, tags, note:None} + pred string per doc_id % 5:
    0: python-literal syntax, tags reversed (set-equal)  -> TP=4
    1: strict JSON with null (to_json)  -> literal_eval REJECTS -> invalid
    2: missing n + hallucinated note    -> TP=2 FP=1 FN=1
    3: extra key + n as string          -> TP=3 FP=2 FN=1
    4: unparseable                      -> invalid
    """
    d = _t(spark, sf_dir, "documents").select(
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
        ),
        {"ignoreNullFields": "false"},
    )
    m = F.col("doc_id") % 5
    pred = (
        F.when(
            m == 0,
            F.format_string(
                "{'title': '%s', 'n': %d, 'tags': ['%s', '%s'], 'note': None}",
                "title", "n", "source", "lang",
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
                "{'title': '%s', 'n': '%d', 'tags': ['%s', '%s'], 'note': None, 'bogus': 1}",
                "title", "n", "lang", "source",
            ),
        )
        .otherwise(F.lit("not a dict {"))
    )
    return d.select("doc_id", gold.alias("gold_json"), pred.alias("pred"))


# the oracle derives scores from the construction (comments in
# _with_json_pairs); the Spark side must reproduce them by real parsing.
_SCORES_DUCK = """
    SELECT doc_id,
           CASE WHEN doc_id % 5 IN (0, 2, 3) THEN 1 ELSE 0 END AS valid_json,
           CASE doc_id % 5 WHEN 0 THEN 4 WHEN 2 THEN 2 WHEN 3 THEN 3 ELSE 0 END AS tp,
           CASE doc_id % 5 WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 0 END AS fp,
           CASE doc_id % 5 WHEN 0 THEN 0 WHEN 2 THEN 1 WHEN 3 THEN 1 ELSE 0 END AS fn
    FROM documents
"""


@register("json_eval_scores", _SCORES_DUCK)
def json_eval_scores(spark, sf_dir):
    """F11 + F12 + F15 — lax parse (python-literal laxity incl. strict-JSON
    null REJECTION) and per-field TP/FP/FN scoring with the reference's
    branch order, as one struct-returning Arrow UDF."""
    pairs = _with_json_pairs(spark, sf_dir)
    s = pairs.select(
        "doc_id", json_eval_udf("pred", "gold_json").alias("s")
    )
    return s.select("doc_id", "s.valid_json", "s.tp", "s.fp", "s.fn")


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
    valid = prf.where(F.col("valid_json") == 1)
    agg = valid.agg(
        F.round(F.avg("p"), 6).alias("mean_precision"),
        F.round(F.avg("r"), 6).alias("mean_recall"),
        F.round(F.avg("f1"), 6).alias("mean_f1"),
        F.round(F.stddev_pop("p"), 6).alias("std_precision"),
        F.round(F.stddev_pop("r"), 6).alias("std_recall"),
        F.round(F.stddev_pop("f1"), 6).alias("std_f1"),
    )
    rate = prf.agg(F.round(F.avg("valid_json"), 6).alias("valid_json_rate"))
    return agg.crossJoin(rate)
