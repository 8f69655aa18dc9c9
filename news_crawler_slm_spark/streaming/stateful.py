"""Custom stateful streaming operator: first-seen URL dedup via
``applyInPandasWithState`` — the streaming twin of the batch seen-set
anti-join (crawl/frontier.py:dedup_new_urls / SURVEY.md J6/U4).

Semantics: for each url (group key), emit exactly ONE row — the first
occurrence by (warc_ts, url) — across the whole lifetime of the query;
every later occurrence in any micro-batch is swallowed. State per key is a
single marker, checkpointed with the query, so a restart never re-emits
(exactly-once, tested across two availableNow runs).

At 10^10 URLs the state store is the scaling concern: key-space is hashed
across shuffle partitions by Spark's state manager; a per-key marker is the
minimum possible state (no timestamps kept after emission). Eviction is a
policy choice — a crawl seen-set must NOT expire, so no timeout is set; a
sliding-dedup variant would pass a ProcessingTimeTimeout and drop keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUTPUT_SCHEMA = "url string, warc_ts timestamp, lang string"
_STATE_SCHEMA = "seen boolean"


def _first_seen_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        # already emitted in an earlier micro-batch: swallow everything
        for _ in pdf_iter:
            pass
        return
    best: dict[str, Any] | None = None
    for pdf in pdf_iter:
        for row in pdf.itertuples(index=False):
            cand = {"url": row.url, "warc_ts": row.warc_ts, "lang": row.lang}
            if best is None or (cand["warc_ts"], cand["url"]) < (best["warc_ts"], best["url"]):
                best = cand
    state.update((True,))
    if best is not None:
        yield pd.DataFrame([best])


def first_seen_dedup(pages: DataFrame) -> DataFrame:
    """pages (streaming) -> one first-seen row per url, exactly once."""
    return (
        pages.select("url", "warc_ts", "lang")
        .groupBy("url")
        .applyInPandasWithState(
            _first_seen_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
