"""Evaluation-metric row functions (reference: evaluation/evaluate_model.py).

Pure-python semantics here; Arrow-vectorized UDF wrappers in ``udfs.py``.
The reference delegates to external libs (HF ``evaluate``, ``Levenshtein``,
``jellyfish``, fastDamerauLevenshtein — evaluate_model.py:96-122); none are
installable offline, so the engine ships self-contained implementations of
the same definitions:

- Levenshtein + normalization (evaluate_model.py:108-109): classic DP,
  distance / max(len(pred), len(gold)).
- Damerau-Levenshtein (evaluate_model.py:111): the reference imports
  ``pyxdameraulevenshtein`` (evaluate_model.py:12), which computes the
  RESTRICTED distance (OSA — each substring edited at most once;
  'ca'->'abc' is 3): ``damerau_levenshtein_osa`` matches it and is what
  the reference-fidelity paths (seq_similarity_metrics, evaluate_json
  body scoring) use. ``damerau_levenshtein`` is the UNRESTRICTED variant
  (true DL, 'ca'->'abc' is 2) kept because DuckDB's
  ``damerau_levenshtein`` implements it — giving the engine an
  oracle-checkable twin for the unrestricted family.
- Jaro-Winkler similarity (evaluate_model.py:113): standard Winkler
  prefix-boost (p=0.1, max prefix 4), applied ONLY when jaro > 0.7 —
  the boost-threshold gate both jellyfish and DuckDB implement
  (DuckDB: 'abcdxxxx'/'abcdyyyy' -> 0.6667, no boost). Verified
  char-exact against DuckDB including low-similarity pairs.
- Rouge-L F-measure (evaluate_model.py:99-100): token-level LCS F1, the
  single-reference case of HF rouge's rougeL.
- BLEU (evaluate_model.py:102-103): corpus BLEU with uniform 4-gram weights
  and brevity penalty (single pred/ref pair), no smoothing — HF bleu
  default.
- METEOR (evaluate_model.py:105-106): implemented from the published
  algorithm with exact + Porter-stem + synonym match stages; the synonym
  stage uses the bundled mini table (functions/synonyms.py — full WordNet
  is absent offline, so scores are a lower bound) — see ``meteor_score``
  docstring for the documented divergences.
- safe_transform_to_json (evaluate_model.py:35-41): ``ast.literal_eval`` —
  accepts *python literal* syntax (single quotes, None/True/False) and
  REJECTS strict-JSON ``null``/``true`` — the reference's quirk, kept.
- evaluate_json (evaluate_model.py:125-225): TP/FP/FN field scoring with
  the reference's exact branch order (extra/missing keys, body subkey+type
  overlap, hallucination, type mismatch, list-as-set, scalar equality).
"""

from __future__ import annotations

import ast


# ---------------------------------------------------------------- distances

def levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def normalized_levenshtein(pred: str, gold: str) -> float:
    """distance / max(len) — evaluate_model.py:108-109 (0.0 for two empties)."""
    m = max(len(pred), len(gold))
    return levenshtein(pred, gold) / m if m else 0.0


def damerau_levenshtein_osa(a: str, b: str) -> int:
    """RESTRICTED Damerau-Levenshtein (optimal string alignment) — matches
    pyxdameraulevenshtein, the library the reference actually imports
    (evaluate_model.py:12): adjacent transposition allowed but no substring
    is edited more than once, so osa('ca','abc') == 3 (dl gives 2)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if not la:
        return lb
    if not lb:
        return la
    prev2 = [0] * (lb + 1)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cost = 0 if a[i - 1] == b[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
            if i > 1 and j > 1 and a[i - 1] == b[j - 2] and a[i - 2] == b[j - 1]:
                cur[j] = min(cur[j], prev2[j - 2] + 1)
        prev2, prev = prev, cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """UNRESTRICTED Damerau-Levenshtein (true DL, adjacent-transposition
    aware, substrings may be re-edited) — the definition DuckDB's
    ``damerau_levenshtein`` implements, kept for the oracle-checked twin.
    NOT what the reference's pyxdameraulevenshtein computes — use
    ``damerau_levenshtein_osa`` for reference fidelity."""
    da: dict[str, int] = {}
    maxdist = len(a) + len(b)
    d = [[0] * (len(b) + 2) for _ in range(len(a) + 2)]
    d[0][0] = maxdist
    for i in range(len(a) + 1):
        d[i + 1][0] = maxdist
        d[i + 1][1] = i
    for j in range(len(b) + 1):
        d[0][j + 1] = maxdist
        d[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            k = da.get(b[j - 1], 0)
            l = db  # noqa: E741
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,  # substitution
                d[i + 1][j] + 1,  # insertion
                d[i][j + 1] + 1,  # deletion
                d[k][l] + (i - k - 1) + 1 + (j - l - 1),  # transposition
            )
        da[a[i - 1]] = i
    return d[len(a) + 1][len(b) + 1]


def jaro(a: str, b: str) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    window = max(len(a), len(b)) // 2 - 1
    window = max(window, 0)
    a_flags = [False] * len(a)
    b_flags = [False] * len(b)
    m = 0
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(len(b), i + window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ca:
                a_flags[i] = b_flags[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    j = 0
    for i, fa in enumerate(a_flags):
        if fa:
            while not b_flags[j]:
                j += 1
            if a[i] != b[j]:
                t += 1
            j += 1
    t //= 2
    return (m / len(a) + m / len(b) + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    """Winkler boost gated on jaro > 0.7 (the boost threshold) — matching
    jellyfish (the reference's lib, evaluate_model.py:113) and DuckDB."""
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a, b):
        if ca != cb or prefix == max_prefix:
            break
        prefix += 1
    return j + prefix * p * (1.0 - j)


# ---------------------------------------------------------- overlap metrics

def _lcs_len(x: list[str], y: list[str]) -> int:
    prev = [0] * (len(y) + 1)
    for xi in x:
        cur = [0]
        for j, yj in enumerate(y, 1):
            cur.append(prev[j - 1] + 1 if xi == yj else max(prev[j], cur[j - 1]))
        prev = cur
    return prev[-1]


def rouge_l_f1(pred: str, gold: str) -> float:
    """Token-level LCS F-measure (rougeL, single reference, beta=1)."""
    p_toks, g_toks = pred.split(), gold.split()
    if not p_toks or not g_toks:
        return 0.0
    lcs = _lcs_len(p_toks, g_toks)
    if lcs == 0:
        return 0.0
    prec, rec = lcs / len(p_toks), lcs / len(g_toks)
    return 2 * prec * rec / (prec + rec)


def bleu(pred: str, gold: str, max_n: int = 4) -> float:
    """Single-pair BLEU, uniform weights, brevity penalty, no smoothing
    (HF `evaluate` bleu default for one prediction/reference)."""
    import math

    p_toks, g_toks = pred.split(), gold.split()
    if not p_toks:
        return 0.0
    log_sum = 0.0
    for n in range(1, max_n + 1):
        p_ngrams = [tuple(p_toks[i : i + n]) for i in range(len(p_toks) - n + 1)]
        g_ngrams = [tuple(g_toks[i : i + n]) for i in range(len(g_toks) - n + 1)]
        if not p_ngrams:
            return 0.0
        g_counts: dict[tuple, int] = {}
        for g in g_ngrams:
            g_counts[g] = g_counts.get(g, 0) + 1
        clipped = 0
        for pg in p_ngrams:
            if g_counts.get(pg, 0) > 0:
                clipped += 1
                g_counts[pg] -= 1
        if clipped == 0:
            return 0.0
        log_sum += math.log(clipped / len(p_ngrams)) / max_n
    bp = 1.0 if len(p_toks) > len(g_toks) else math.exp(1 - len(g_toks) / max(1, len(p_toks)))
    return bp * math.exp(log_sum)


def _meteor_align(hyp: list[str], ref: list[str]) -> list[tuple[int, int]]:
    """Stage-wise greedy alignment (nltk meteor_score semantics): exact
    matches first, then Porter-stem matches over the leftovers, then
    synonym matches (bundled mini table, functions/synonyms.py) over what
    remains. For each hypothesis token in order, claim the first unmatched
    reference token the stage's predicate accepts. Returns (hyp_idx,
    ref_idx) pairs."""
    from .stemmer import porter_stem
    from .synonyms import are_synonyms

    # stems computed once per token (O(H+R)), not inside the pair loop —
    # this runs per corpus row in the Arrow UDF hot path
    h_stem = [porter_stem(w) for w in hyp]
    r_stem = [porter_stem(w) for w in ref]

    matches: list[tuple[int, int]] = []
    h_left = list(enumerate(hyp))
    r_left = list(enumerate(ref))

    def stage(match_fn) -> None:
        nonlocal h_left
        next_h = []
        for i, hw in h_left:
            for pos, (j, rw) in enumerate(r_left):
                if match_fn(i, hw, j, rw):
                    matches.append((i, j))
                    del r_left[pos]
                    break
            else:
                next_h.append((i, hw))
        h_left = next_h

    stage(lambda i, h, j, r: h == r)
    stage(lambda i, h, j, r: h_stem[i] == r_stem[j])
    stage(lambda i, h, j, r: are_synonyms(h, r))
    return matches


def meteor_score(
    pred: str,
    gold: str,
    alpha: float = 0.9,
    beta: float = 3.0,
    gamma: float = 0.5,
) -> float:
    """METEOR, single reference (Banerjee & Lavie 2005; nltk
    ``single_meteor_score`` formula — the reference's metric via HF
    ``evaluate``, evaluate_model.py:105-106): stage-wise unigram alignment,
    harmonic mean weighted toward recall (alpha=0.9), fragmentation penalty
    gamma*(chunks/matches)**beta.

    Offline divergences (documented, not silent): (1) the synonym stage
    runs over the bundled mini table (functions/synonyms.py) — a strict
    subset of WordNet (the nltk corpus is unavailable here), so scores
    are a lower bound, identical whenever no rarer synonym-only match
    exists; (2) tokenization is lowercase whitespace split, not nltk
    ``word_tokenize`` — identical on whitespace-clean text; (3) the stem
    stage uses the ORIGINAL published Porter algorithm
    (functions/stemmer.py), not nltk's extended mode."""
    hyp, ref = pred.lower().split(), gold.lower().split()
    if not hyp or not ref:
        return 0.0
    matches = sorted(_meteor_align(hyp, ref))
    m = len(matches)
    if m == 0:
        return 0.0
    precision = m / len(hyp)
    recall = m / len(ref)
    fmean = precision * recall / (alpha * precision + (1 - alpha) * recall)
    chunks = sum(
        1
        for k, (i, j) in enumerate(matches)
        if k == 0 or not (i == matches[k - 1][0] + 1 and j == matches[k - 1][1] + 1)
    )
    penalty = gamma * (chunks / m) ** beta
    return (1 - penalty) * fmean


# ------------------------------------------------------------- JSON scoring

def safe_transform_to_json(pred_str: str):
    """evaluate_model.py:35-41 — python-literal laxity, strict-JSON null
    REJECTED (ast.literal_eval semantics, intentionally identical)."""
    try:
        return ast.literal_eval(pred_str)
    except (SyntaxError, ValueError):
        return None


def get_key_sets(pred_keys: set, gold_keys: set):
    return pred_keys - gold_keys, gold_keys - pred_keys, pred_keys & gold_keys


def collect_unique_keys_and_types(data, prefix: str = "", result=None):
    """evaluate_model.py:54-76 — dotted key-paths -> set of type names."""
    if result is None:
        result = {}
    if isinstance(data, dict):
        for key, value in data.items():
            new_prefix = f"{prefix}.{key}" if prefix else key
            result.setdefault(new_prefix, set()).add(type(value).__name__)
            collect_unique_keys_and_types(value, new_prefix, result)
    elif isinstance(data, list):
        for item in data:
            if isinstance(item, (dict, list)):
                collect_unique_keys_and_types(item, prefix, result)
    return result


def extract_all_text(data) -> str:
    """evaluate_model.py:79-93 — space-join of all nested strings."""
    texts = []
    if isinstance(data, str):
        texts.append(data)
    elif isinstance(data, dict):
        for value in data.values():
            texts.append(extract_all_text(value))
    elif isinstance(data, list):
        for item in data:
            texts.append(extract_all_text(item))
    return " ".join(t for t in texts if t)


def evaluate_json(prediction: str, gold_data: dict) -> dict:
    """evaluate_model.py:125-225 with identical branch order, including all
    six ``body_*`` text metrics (calculate_text_similarity_metrics,
    evaluate_model.py:97-123; METEOR per meteor_score's documented offline
    divergences)."""
    valid_json = safe_transform_to_json(prediction)
    if valid_json is None or not isinstance(valid_json, dict):
        return {"valid_json": 0, "TP": 0, "FP": 0, "FN": 0}

    scores = {"valid_json": 1, "TP": 0, "FP": 0, "FN": 0}
    extra, missing, common = get_key_sets(set(valid_json), set(gold_data))
    scores["FP"] += len(extra)
    scores["FN"] += len(missing)

    for key in common:
        pred_value, gold_value = valid_json[key], gold_data[key]
        if key == "body":
            gb = collect_unique_keys_and_types(gold_value)
            pb = collect_unique_keys_and_types(pred_value)
            e2, m2, c2 = get_key_sets(set(pb), set(gb))
            scores["FP"] += len(e2)
            scores["FN"] += len(m2)
            for sub in c2:
                if gb[sub] != pb[sub]:
                    scores["FN"] += 1
                    scores["FP"] += 1
            g_text, p_text = extract_all_text(gold_value), extract_all_text(pred_value)
            scores["body_Rouge-L"] = rouge_l_f1(p_text, g_text)
            scores["body_BLEU"] = bleu(p_text, g_text)
            scores["body_METEOR"] = meteor_score(p_text, g_text)
            scores["body_Levenshtein"] = normalized_levenshtein(p_text, g_text)
            scores["body_Damerau"] = float(damerau_levenshtein_osa(p_text, g_text))
            scores["body_Jaro-Winkler"] = jaro_winkler(p_text, g_text)
        elif gold_value is None and pred_value is not None:
            scores["FP"] += 1
        elif type(gold_value) is not type(pred_value):
            scores["FN"] += 1
            scores["FP"] += 1
        elif isinstance(gold_value, list):
            if set(gold_value) != set(pred_value):
                scores["FN"] += 1
                scores["FP"] += 1
            else:
                scores["TP"] += 1
        elif pred_value != gold_value:
            scores["FN"] += 1
            scores["FP"] += 1
        else:
            scores["TP"] += 1
    return scores
