"""Metric row-function semantics (reference: evaluation/evaluate_model.py).
Cross-engine identity of levenshtein/jaro-winkler is pinned by the
edit_distance_metrics oracle test; these pin the pure-python semantics."""

from __future__ import annotations

import pytest

from news_crawler_slm_spark.functions import metrics as M


def test_levenshtein_and_normalization():
    assert M.levenshtein("kitten", "sitting") == 3
    assert M.normalized_levenshtein("kitten", "sitting") == 3 / 7
    assert M.normalized_levenshtein("", "") == 0.0  # guard, no ZeroDivision


def test_damerau_unrestricted():
    # unrestricted DL: "ca" -> "abc" is 2 (restricted OSA gives 3)
    assert M.damerau_levenshtein("ca", "abc") == 2
    assert M.damerau_levenshtein("martha", "marhta") == 1
    assert M.damerau_levenshtein("", "abc") == 3


def test_damerau_osa_restricted():
    # restricted OSA (pyxdameraulevenshtein, the reference's import,
    # evaluate_model.py:12): no substring edited twice -> "ca"->"abc" is 3
    assert M.damerau_levenshtein_osa("ca", "abc") == 3
    assert M.damerau_levenshtein_osa("martha", "marhta") == 1
    assert M.damerau_levenshtein_osa("ab", "ba") == 1
    assert M.damerau_levenshtein_osa("", "abc") == 3
    assert M.damerau_levenshtein_osa("kitten", "sitting") == 3  # == lev when no transpositions


def test_jaro_winkler_canonical():
    assert abs(M.jaro_winkler("martha", "marhta") - 0.9611111111111111) < 1e-12
    assert abs(M.jaro_winkler("dixon", "dicksonx") - 0.8133333333333332) < 1e-12
    assert M.jaro_winkler("", "") == 1.0
    assert M.jaro_winkler("a", "") == 0.0


def test_jaro_winkler_boost_gate():
    # Winkler boost only applies when jaro > 0.7 (jellyfish + DuckDB
    # semantics, ADVICE r1): common 4-prefix but low jaro -> NO boost.
    assert abs(M.jaro_winkler("abcdxxxx", "abcdyyyy") - 2 / 3) < 1e-12
    assert M.jaro_winkler("abcdxxxx", "abcdyyyy") == M.jaro("abcdxxxx", "abcdyyyy")


def test_rouge_bleu():
    assert M.rouge_l_f1("a b c", "a b c") == 1.0
    assert M.rouge_l_f1("", "a") == 0.0
    assert abs(M.rouge_l_f1("the cat sat", "the cat sat on the mat") - 2/3) < 1e-12
    assert M.bleu("a b c d e", "a b c d e") == 1.0
    assert M.bleu("x y z w", "a b c d") == 0.0


def test_meteor_no_match_is_zero():
    # 'a'/'b': no exact or stem alignment -> 0.0
    assert M.meteor_score("a", "b") == 0.0


def test_lax_json_parse_reference_quirk():
    # evaluate_model.py:35-41 uses ast.literal_eval: python-literal syntax
    # accepted, strict-JSON null/true REJECTED.
    assert M.safe_transform_to_json("{'a': 1, 'b': None}") == {"a": 1, "b": None}
    assert M.safe_transform_to_json('{"a": 1}') == {"a": 1}
    assert M.safe_transform_to_json('{"a": null}') is None
    assert M.safe_transform_to_json("garbage {") is None


def test_evaluate_json_branches():
    gold = {"t": "x", "n": 5, "tags": ["a", "b"], "note": None}
    # identical (tags as set) -> all TP
    s = M.evaluate_json("{'t': 'x', 'n': 5, 'tags': ['b', 'a'], 'note': None}", gold)
    assert (s["TP"], s["FP"], s["FN"]) == (4, 0, 0)
    # hallucination on None-valued key + missing key + extra key + mismatch
    s = M.evaluate_json("{'t': 'y', 'tags': ['a'], 'note': 1, 'zz': 0}", gold)
    # t wrong (FN+FP), n missing (FN), tags set-differ (FN+FP),
    # note halluc (FP), zz extra (FP)
    assert (s["TP"], s["FP"], s["FN"]) == (0, 4, 3)
    # type mismatch
    s = M.evaluate_json("{'t': 'x', 'n': '5', 'tags': ['a','b'], 'note': None}", gold)
    assert (s["TP"], s["FP"], s["FN"]) == (3, 1, 1)
    # invalid
    assert M.evaluate_json("null", gold)["valid_json"] == 0


def test_evaluate_json_body_subkeys():
    gold = {"body": {"p": "hello world", "meta": {"k": 1}}}
    pred = "{'body': {'p': 'hello world', 'meta': {'k': 'one'}, 'xtra': 2}}"
    s = M.evaluate_json(pred, gold)
    # body.meta.k type differs (FN+FP), body.xtra extra (FP); text metrics present
    assert s["FP"] == 2 and s["FN"] == 1
    assert 0.0 <= s["body_Rouge-L"] <= 1.0 and "body_Jaro-Winkler" in s


def test_evaluate_json_body_text_metrics_values():
    # hand-computed values for the body text path (evaluate_model.py:158-205)
    gold = {"body": {"h": "a b c d e"}}
    s = M.evaluate_json("{'body': {'h': 'a b c d e'}}", gold)
    assert s["body_Rouge-L"] == 1.0 and s["body_BLEU"] == 1.0
    assert s["body_Levenshtein"] == 0.0 and s["body_Damerau"] == 0.0
    assert s["body_Jaro-Winkler"] == 1.0
    # one appended token: prec 5/6, rec 1 -> f1 = 10/11; lev 2/11 (' x')
    s = M.evaluate_json("{'body': {'h': 'a b c d e x'}}", gold)
    assert abs(s["body_Rouge-L"] - 10 / 11) < 1e-12
    assert abs(s["body_Levenshtein"] - 2 / 11) < 1e-12
    assert s["body_Damerau"] == 2.0
    # OSA used in body scoring (reference's pyxdameraulevenshtein)
    s = M.evaluate_json("{'body': {'h': 'ca'}}", {"body": {"h": "abc"}})
    assert s["body_Damerau"] == 3.0


def test_extract_all_text_and_key_walk():
    data = {"a": "x", "b": {"c": "y", "d": [1, "z"]}}
    assert M.extract_all_text(data) == "x y z"
    walk = M.collect_unique_keys_and_types(data)
    assert walk["b.c"] == {"str"} and "a" in walk and walk["b"] == {"dict"}


def test_porter_stemmer():
    # end-to-end outputs of the published algorithm (hand-traced through all
    # five steps; per-step examples in the paper continue through later
    # steps, e.g. relational -ATIONAL->ATE-> relate -5a-> relat)
    from news_crawler_slm_spark.functions.stemmer import porter_stem

    vectors = {
        "caresses": "caress", "ponies": "poni", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "motoring": "motor", "sing": "sing", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "failing": "fail", "filing": "file", "happy": "happi",
        "sky": "sky", "relational": "relat", "conditional": "condit",
        "rational": "ration", "hesitanci": "hesit", "digitizer": "digit",
        "hopefulness": "hope", "electrical": "electr",
        "adoption": "adopt", "adjustable": "adjust", "running": "run",
        "runs": "run", "oscillators": "oscil", "generalizations": "gener",
        "a": "a", "is": "is",
    }
    bad = {w: porter_stem(w) for w, want in vectors.items() if porter_stem(w) != want}
    assert not bad, bad


def test_meteor_identical_and_append():
    # identical 3-token pair: m=3, P=R=1, chunks=1
    fmean_1 = (1.0 * 1.0) / (0.9 * 1.0 + (1 - 0.9) * 1.0)
    want = (1 - 0.5 * (1 / 3) ** 3.0) * fmean_1
    assert M.meteor_score("the cat sat", "the cat sat") == pytest.approx(want, abs=1e-15)
    # one appended token: m=3 of hyp 4, P=3/4, R=1, chunks=1
    p = 3 / 4
    fmean = (p * 1.0) / (0.9 * p + (1 - 0.9) * 1.0)
    want = (1 - 0.5 * (1 / 3) ** 3.0) * fmean
    assert M.meteor_score("the cat sat on", "the cat sat") == pytest.approx(want, abs=1e-15)


def test_meteor_fragmentation_penalty():
    # fully reversed word order: every match its own chunk -> penalty = gamma
    assert M.meteor_score("sat cat the", "the cat sat") == pytest.approx(
        0.5 * (1.0 / (0.9 + (1 - 0.9))), abs=1e-15
    )


def test_meteor_synonym_stage():
    """The mini-table synonym stage (functions/synonyms.py) aligns
    synonym-only pairs exactly like nltk's WordNet stage would."""
    from news_crawler_slm_spark.functions.synonyms import are_synonyms

    assert are_synonyms("quick", "fast")
    assert are_synonyms("big", "enormous")
    assert not are_synonyms("quick", "slow")
    assert not are_synonyms("qzj", "fast")

    # big↔large via the table, the other 3 tokens exact: m=4, P=R=1, 1 chunk
    fmean_1 = (1.0 * 1.0) / (0.9 * 1.0 + (1 - 0.9) * 1.0)
    want = (1 - 0.5 * (1 / 4) ** 3.0) * fmean_1
    assert M.meteor_score("the dog is big", "the dog is large") == pytest.approx(
        want, abs=1e-15
    )
    # synonym-only single-token pair: m=1, penalty = 0.5
    assert M.meteor_score("big", "large") == pytest.approx(0.5 * fmean_1, abs=1e-15)
    # out-of-table word: no match at any stage
    assert M.meteor_score("qzj", "large") == 0.0
    # exact matches claim tokens before the synonym stage sees them:
    # crossed exact alignment -> 2 chunks -> penalty = gamma
    assert M.meteor_score("large big", "big large") == pytest.approx(
        0.5 * fmean_1, abs=1e-15
    )


def test_meteor_stem_stage_and_edges():
    # exact stage misses, Porter-stem stage aligns run/run: m=1, chunks=1,
    # penalty = 0.5 * (1/1)^3 = 0.5
    assert M.meteor_score("running", "runs") == pytest.approx(
        0.5 * (1.0 / (0.9 + (1 - 0.9))), abs=1e-15
    )
    assert M.meteor_score("", "the cat") == 0.0
    assert M.meteor_score("the cat", "") == 0.0
    assert M.meteor_score("xyz", "abc") == 0.0
    # case-insensitive (preprocess=str.lower)
    assert M.meteor_score("The CAT", "the cat") > 0.9
