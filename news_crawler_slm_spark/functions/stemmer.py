"""Porter stemmer — M.F. Porter, "An algorithm for suffix stripping",
Program 14(3) 1980. Implemented from the published algorithm definition
(public knowledge), used by the METEOR stem-match stage
(functions/metrics.py:meteor_score).

DIVERGENCE NOTE: the reference's METEOR (HF ``evaluate`` → nltk,
evaluate_model.py:105) uses nltk's PorterStemmer in its default
NLTK_EXTENSIONS mode, which departs from the published algorithm on a small
set of words (e.g. irregular plural forms). This module implements the
ORIGINAL published algorithm; any word where the two modes differ can shift
the stem-stage alignment. Exact-stage matches (the overwhelming majority on
real text) are unaffected.

Pure function of a lowercase ASCII word; no state — safe inside Arrow
batches without serialization concerns.
"""

from __future__ import annotations

_VOWELS = set("aeiou")


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]: the number of vowel→consonant transitions."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        if _is_consonant(stem, i):
            if prev_vowel:
                m += 1
            prev_vowel = False
        else:
            prev_vowel = True
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _ends_cvc(word: str) -> bool:
    """*o — stem ends consonant-vowel-consonant, final consonant not w/x/y."""
    if len(word) < 3:
        return False
    return (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in "wxy"
    )


def _replace_longest(word: str, rules: list[tuple[str, str, int | None]]) -> str:
    """Apply the rule whose suffix is the LONGEST match; its m-condition
    (measured on the stem before the old suffix) gates application. Per the
    published algorithm, only the longest-matching suffix in a step is
    considered — a failed condition does not fall through to shorter ones."""
    best = None
    for old, new, min_m in rules:
        if word.endswith(old) and (best is None or len(old) > len(best[0])):
            best = (old, new, min_m)
    if best is None:
        return word
    old, new, min_m = best
    stem = word[: len(word) - len(old)]
    if min_m is not None and not _measure(stem) > min_m:
        return word
    return stem + new


_STEP2 = [
    ("ational", "ate", 0), ("tional", "tion", 0), ("enci", "ence", 0),
    ("anci", "ance", 0), ("izer", "ize", 0), ("abli", "able", 0),
    ("alli", "al", 0), ("entli", "ent", 0), ("eli", "e", 0),
    ("ousli", "ous", 0), ("ization", "ize", 0), ("ation", "ate", 0),
    ("ator", "ate", 0), ("alism", "al", 0), ("iveness", "ive", 0),
    ("fulness", "ful", 0), ("ousness", "ous", 0), ("aliti", "al", 0),
    ("iviti", "ive", 0), ("biliti", "ble", 0),
]
_STEP3 = [
    ("icate", "ic", 0), ("ative", "", 0), ("alize", "al", 0),
    ("iciti", "ic", 0), ("ical", "ic", 0), ("ful", "", 0), ("ness", "", 0),
]
_STEP4 = [
    ("al", "", 1), ("ance", "", 1), ("ence", "", 1), ("er", "", 1),
    ("ic", "", 1), ("able", "", 1), ("ible", "", 1), ("ant", "", 1),
    ("ement", "", 1), ("ment", "", 1), ("ent", "", 1), ("ou", "", 1),
    ("ism", "", 1), ("ate", "", 1), ("iti", "", 1), ("ous", "", 1),
    ("ive", "", 1), ("ize", "", 1),
]


def porter_stem(word: str) -> str:
    if len(word) <= 2:
        return word

    # Step 1a
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif not word.endswith("ss") and word.endswith("s"):
        word = word[:-1]

    # Step 1b
    fired = False
    if word.endswith("eed"):
        if _measure(word[:-3]) > 0:
            word = word[:-1]
    elif word.endswith("ed") and _has_vowel(word[:-2]):
        word = word[:-2]
        fired = True
    elif word.endswith("ing") and _has_vowel(word[:-3]):
        word = word[:-3]
        fired = True
    if fired:
        if word.endswith(("at", "bl", "iz")):
            word += "e"
        elif _ends_double_consonant(word) and word[-1] not in "lsz":
            word = word[:-1]
        elif _measure(word) == 1 and _ends_cvc(word):
            word += "e"

    # Step 1c
    if word.endswith("y") and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    word = _replace_longest(word, _STEP2)
    word = _replace_longest(word, _STEP3)

    # Step 4 — 'ion' carries the extra *S-or-*T condition
    pre4 = word
    word = _replace_longest(word, _STEP4)
    if word == pre4 and pre4.endswith("ion"):
        stem = pre4[:-3]
        if stem.endswith(("s", "t")) and _measure(stem) > 1:
            word = stem

    # Step 5a
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _ends_cvc(stem)):
            word = stem
    # Step 5b
    if _ends_double_consonant(word) and word[-1] == "l" and _measure(word[:-1]) > 1:
        word = word[:-1]
    return word
