"""Pure text functions: tokenization, repetition, language-ID, quality,
fingerprinting. All deterministic, numpy/stdlib only, designed to be called
from Arrow-batched pandas UDFs (never row-at-a-time Python UDFs).

Where a function is SQL-expressible it ALSO has a Column-expression twin in
``operators/`` so the hot path stays JVM-side; the Python versions here are
the single source of truth for semantics and power the golden tests.
"""

from __future__ import annotations

import re
from collections import Counter

# ---------------------------------------------------------------- tokenizing

# Whitespace tokenizer — matches the reference's ``text.split()`` convention
# (omit_degeneration.py:17) and is expressible as
# size(split(trim(col), '\\s+')) JVM-side.
_WS = re.compile(r"\s+")

# BPE-ish subword-ish regex tokenizer (GPT-2-style pattern, public knowledge):
# contractions, letter runs, digit runs, punctuation runs, whitespace chunks.
# Stands in for the HF tokenizer at step_04:14-17 (no model downloads offline);
# deterministic and vectorizable.
_BPEISH = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[^\W\d_]+| ?\d+| ?[^\s\w]+|\s+(?!\S)|\s+",
    re.UNICODE,
)


def ws_tokens(text: str) -> list[str]:
    if not text:
        return []
    return [t for t in _WS.split(text.strip()) if t]


def ws_token_count(text: str) -> int:
    return len(ws_tokens(text))


def bpeish_token_count(text: str) -> int:
    """Subword-ish token count (reference analog: len(tokenizer.tokenize(x)),
    step_04_get_token_statistics.py:14-17)."""
    if not text:
        return 0
    return len(_BPEISH.findall(text))


# ---------------------------------------------------------------- repetition

def repetition_severity_ratio(text: str, n: int = 5) -> float:
    """Ratio of repeated n-grams, counting multiplicity.

    Exact reference semantics (omit_degeneration.py:13-30): whitespace split;
    <n tokens → 0.0; overlapping word n-grams; sum(count-1 for count>1)/total.
    """
    tokens = text.split()
    if len(tokens) < n:
        return 0.0
    total = len(tokens) - n + 1
    counts: Counter[tuple[str, ...]] = Counter(
        tuple(tokens[i : i + n]) for i in range(total)
    )
    repeated = sum(c - 1 for c in counts.values() if c > 1)
    return repeated / total if total > 0 else 0.0


# ---------------------------------------------------------------- language ID

# Tiny deterministic n-gram heuristic over the driver corpus languages
# {en, de, fr, es, it}. Engine addition (training-data-pipeline operator);
# the reference takes language from Fundus (crawl_articles.py:109).
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to ", " is ", " that "),
    "de": (" der ", " die ", " und ", " das ", " nicht ", " ist "),
    "fr": (" le ", " la ", " les ", " et ", " est ", " une "),
    "es": (" el ", " los ", " que ", " y ", " una ", " es "),
    "it": (" il ", " che ", " di ", " e ", " una ", " per "),
}


def detect_language(text: str) -> str:
    """Best-scoring marker language, 'und' if nothing matches."""
    if not text:
        return "und"
    padded = " " + text.lower() + " "
    best_lang, best_score = "und", 0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(padded.count(m) for m in markers)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


# ---------------------------------------------------------------- quality

_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)
_STOPWORDS = frozenset(
    "the a an and or of to in is it that for on with as at this by from".split()
)


def quality_features(text: str) -> dict[str, float]:
    """Length / punctuation-ratio / stopword-ratio / mean-word-length features
    for heuristic quality scoring (engine addition; Gopher/C4-style rules are
    public knowledge)."""
    toks = ws_tokens(text)
    n = len(toks)
    n_chars = len(text)
    punct = len(_PUNCT.findall(text))
    stop = sum(1 for t in toks if t.lower() in _STOPWORDS)
    mean_wl = (sum(len(t) for t in toks) / n) if n else 0.0
    return {
        "n_tokens": float(n),
        "n_chars": float(n_chars),
        "punct_ratio": (punct / n_chars) if n_chars else 0.0,
        "stopword_ratio": (stop / n) if n else 0.0,
        "mean_word_len": mean_wl,
    }


# ---------------------------------------------------------------- fingerprint

_FP_MOD = (1 << 61) - 1
_FP_BASE = 257


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash of the whole document (deterministic 61-bit).

    Document fingerprinting primitive for exact dedup when a cheap,
    platform-stable hash is wanted Python-side; the JVM twin is xxhash64/md5.
    """
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _FP_BASE + b) % _FP_MOD
    return h


def shingles(text: str, k: int = 5) -> list[str]:
    """Overlapping word k-shingles (space-joined) for MinHash / Jaccard."""
    toks = ws_tokens(text.lower())
    if len(toks) < k:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
