"""Arrow-vectorized UDF surface (the engine's ONLY Python execution path).

Per BASELINE.json ``input_hint``: "vectorized pandas/Arrow UDFs (no per-row
Python) throughout". Every function here is a ``pandas_udf`` operating on
whole Arrow batches; the row-level semantics live in pure functions in
``html_clean.py`` / ``text.py`` so the sequential oracle and the distributed
path share one implementation (that is what makes byte-identity provable).

Reference analogs: dataset.map row-wise (step_03_clean_html.py:92-94),
dataset.map batched (evaluate_model.py:325-336).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .html_clean import clean_html, extract_plaintext
from .text import (
    bpeish_token_count,
    detect_language,
    repetition_severity_ratio,
    rolling_fingerprint,
    shingles,
)


def _as_str(v: object) -> str:
    if v is None:
        return ""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).decode("utf-8", errors="replace")
    return str(v)


@F.pandas_udf(T.StringType())
def clean_html_udf(html: pd.Series) -> pd.Series:
    """F1 — reference clean_html over an Arrow batch (accepts binary or str)."""
    return html.map(lambda v: clean_html(_as_str(v)))


@F.pandas_udf(T.StringType())
def extract_plaintext_udf(html: pd.Series) -> pd.Series:
    return html.map(lambda v: extract_plaintext(_as_str(v)))


@F.pandas_udf(T.LongType())
def bpeish_token_count_udf(text: pd.Series) -> pd.Series:
    """F2 — subword-ish token count (HF-tokenizer stand-in, step_04:14-17)."""
    return text.map(lambda v: bpeish_token_count(_as_str(v))).astype("int64")


@F.pandas_udf(T.DoubleType())
def repetition_ratio_udf(text: pd.Series) -> pd.Series:
    """F5 — repeated-5-gram severity ratio (omit_degeneration.py:13-30)."""
    return text.map(lambda v: repetition_severity_ratio(_as_str(v))).astype("float64")


@F.pandas_udf(T.StringType())
def detect_language_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda v: detect_language(_as_str(v)))


@F.pandas_udf(T.LongType())
def fingerprint_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda v: rolling_fingerprint(_as_str(v))).astype("int64")


@F.pandas_udf(T.ArrayType(T.StringType()))
def shingles_udf(text: pd.Series) -> pd.Series:
    return text.map(lambda v: shingles(_as_str(v)))
