"""Unicode normalization + mojibake repair for web-crawled text.

The reference pipeline consumes library-extracted article text and never
confronts encoding damage (crawl_articles.py trusts Fundus's decoding); a
crawl-scale engine cannot — CommonCrawl-style corpora carry a long tail of
(a) canonically-unnormalized Unicode (NFD/NFC mixtures break exact dedup:
identical strings hash differently) and (b) mojibake from UTF-8 bytes
decoded as cp1252/latin-1 somewhere upstream ("Ã©" for "é", "â€œ" for a
curly quote), classically repaired by ftfy.  Both fixes are pure
per-string functions here so the distributed Arrow-batch path
(functions/udfs.py) and tests share one implementation — the same
sequential≡distributed discipline as html_clean.py.

Cross-engine check: ``strip_accents_nfc`` is DuckDB's
``strip_accents(nfc_normalize(x))`` for decomposable characters — the
``unicode_normalize`` catalog query pins md5 equality of the two engines'
outputs over an accent-decorated corpus (plans/catalog.py).  Mojibake
repair has no DuckDB twin; it is pinned by crafted-pair unit tests
(tests/test_text_ops.py).
"""

from __future__ import annotations

import codecs
import unicodedata

# Damage artifacts that appear when UTF-8 bytes are mis-decoded: the
# cp1252 flavor shows lead-byte letters ("Ã"/"Â") and the 0xE2 0x80
# punctuation family ("â€¦"); the latin-1 flavor shows raw C1 control
# characters (U+0080-U+009F) verbatim — essentially never present in clean
# text.  Marker presence is necessary (not sufficient) for the repair to
# apply — a pass is only accepted when the re-decode round-trips AND
# strictly reduces the marker count.
_MOJIBAKE_MARKERS = ("Ã", "Â", "â€")

_MAX_REPAIR_PASSES = 3  # double/triple-encoded text unwraps one layer per pass


def strip_accents_nfc(s: str) -> str:
    """NFC-normalize then strip combining marks (accents) — the Python twin
    of DuckDB ``strip_accents(nfc_normalize(s))`` on decomposable chars:
    NFC first (compose any loose combining sequences so équality of
    representation holds), then NFD-decompose and drop Mn-category marks.
    Non-decomposable letters (ø, đ) pass through unchanged, matching
    ICU-less strip_accents behavior on the decorated test corpus."""
    composed = unicodedata.normalize("NFC", s)
    return "".join(
        c
        for c in unicodedata.normalize("NFD", composed)
        if not unicodedata.combining(c)
    )


def _marker_count(s: str) -> int:
    c1 = sum(1 for ch in s if 0x80 <= ord(ch) <= 0x9F)
    return c1 + sum(s.count(m) for m in _MOJIBAKE_MARKERS)


def _c1_passthrough(err: UnicodeError) -> tuple[bytes, int]:
    """codecs error handler making cp1252 'sloppy' (the ftfy codec): C1
    control characters U+0080-U+009F — which appear verbatim when UTF-8
    continuation bytes were decoded as latin-1, and five of which cp1252
    leaves undefined (0x81 8D 8F 90 9D) — encode to their own byte value.
    With this fallback, sloppy-cp1252 is a strict superset of latin-1, so
    one codec covers both common damage flavors."""
    chunk = err.object[err.start : err.end]  # type: ignore[index]
    if all(0x80 <= ord(c) <= 0x9F for c in chunk):
        return bytes(ord(c) for c in chunk), err.end  # type: ignore[attr-defined]
    raise err


codecs.register_error("sloppy_cp1252_c1", _c1_passthrough)


def repair_mojibake(s: str) -> str:
    """Undo UTF-8-bytes-decoded-as-cp1252/latin-1 damage, the ftfy core
    move: re-encode with sloppy cp1252 (cp1252 plus C1 passthrough — see
    _c1_passthrough) and decode as UTF-8, accepting a pass only if it
    round-trips and strictly reduces mojibake markers (so clean text that
    legitimately contains "Ã" survives untouched).  Runs up to
    _MAX_REPAIR_PASSES times because double-encoded text unwraps one layer
    per pass.  Deterministic and total: any failure leaves the input as-is.
    """
    cur = s
    for _ in range(_MAX_REPAIR_PASSES):
        before = _marker_count(cur)
        if before == 0:
            break
        try:
            fixed = cur.encode("cp1252", errors="sloppy_cp1252_c1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            break
        if _marker_count(fixed) >= before:
            break
        cur = fixed
    return cur
