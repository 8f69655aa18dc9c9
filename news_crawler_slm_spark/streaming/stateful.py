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
    # vectorized first-row pick: lexicographic min over (warc_ts, url) is a
    # sort_values head — no per-row Python even inside the (tiny) url group
    best: pd.DataFrame | None = None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        cand = pdf.sort_values(["warc_ts", "url"], kind="mergesort").iloc[:1]
        both = cand if best is None else pd.concat([best, cand])
        best = both.sort_values(["warc_ts", "url"], kind="mergesort").iloc[:1]
    state.update((True,))
    if best is not None:
        yield best[["url", "warc_ts", "lang"]]


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


# ---------------------------------------------------------------- sessions

SESSION_OUTPUT_SCHEMA = (
    "publisher string, session_start timestamp, session_end timestamp, n_events bigint"
)
_SESSION_STATE_SCHEMA = "start timestamp, last timestamp, n bigint"
_SESSION_GAP_MS = 30 * 60 * 1000


def _ms(ts) -> int:
    # naive timestamps are UTC under this engine's fixed session timezone;
    # pd.Timestamp.value interprets naive input as UTC (datetime.timestamp()
    # would use the worker's LOCAL zone — wrong on a non-UTC host)
    return pd.Timestamp(ts).value // 1_000_000


def _session_fn(
    key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cols = ["publisher", "session_start", "session_end", "n_events"]
    if state.hasTimedOut:
        start, last, n = state.get
        state.remove()
        yield pd.DataFrame([(key[0], start, last, n)], columns=cols)
        return
    ts_all: list = []
    for pdf in pdf_iter:
        ts_all.extend(pdf["warc_ts"].tolist())
    ts_all.sort()
    closed: list[tuple] = []
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    for ts in ts_all:
        if last is not None and _ms(ts) - _ms(last) > _SESSION_GAP_MS:
            closed.append((key[0], start, last, n))
            start, last, n = ts, ts, 0
        if start is None:
            start, last = ts, ts
        else:
            # a LATE event (cross-batch, admitted by the watermark) can sort
            # before the open session's bounds: absorb it by min/max instead
            # of letting last (and the eviction timeout) move backwards.
            # Exact whenever watermark delay <= gap: an admitted event is
            # >= max_seen - delay > last - gap, so it always merges.
            start, last = min(start, ts), max(last, ts)
        n += 1
    state.update((start, last, n))
    # evict via event time: fire once the watermark passes last + gap
    state.setTimeoutTimestamp(_ms(last) + _SESSION_GAP_MS)
    if closed:
        yield pd.DataFrame(closed, columns=cols)


_DELAY_UNITS_MS = {
    "microsecond": 1e-3, "millisecond": 1, "second": 1000, "minute": 60_000,
    "hour": 3_600_000, "day": 86_400_000, "week": 604_800_000,
}


def _delay_ms(delay: str) -> int:
    """Parse a Spark CalendarInterval-style watermark delay ('N unit[s]')."""
    parts = delay.strip().lower().split()
    if len(parts) != 2 or parts[1].rstrip("s") not in _DELAY_UNITS_MS:
        raise ValueError(f"unsupported watermark delay {delay!r}")
    return int(float(parts[0]) * _DELAY_UNITS_MS[parts[1].rstrip("s")])


def session_windows(pages: DataFrame, delay: str = "1 minute") -> DataFrame:
    """Gap-based session windows per publisher (30-minute silence closes a
    session) — the streaming twin of the batch ``sessionization`` query,
    built on ``applyInPandasWithState`` with an EVENT-TIME TIMEOUT: sessions
    that close inside a micro-batch (a later event arrives past the gap)
    emit immediately; the open tail session is held in state and emitted by
    the timeout callback once the watermark passes last_event + gap, so
    state is EVICTED — unlike the crawl seen-set (policy note in the module
    doc), session state must not grow forever.  State per key is
    (start, last, n): O(1) regardless of session length.

    ``delay`` must be <= the 30-minute session gap: the min/max late-event
    absorption in _session_fn is exact only then (an admitted event is
    >= max_seen - delay > last - gap, so it always merges into the open
    session); a larger delay would silently merge sessions the batch twin
    splits — rejected here rather than documented away."""
    if _delay_ms(delay) > _SESSION_GAP_MS:
        raise ValueError(
            f"watermark delay {delay!r} exceeds the {_SESSION_GAP_MS // 60000}-minute "
            "session gap: late events could span a closed-session boundary and "
            "session_windows would diverge from the batch sessionization query"
        )
    return (
        pages.select("publisher", "warc_ts")
        .withWatermark("warc_ts", delay)
        .groupBy("publisher")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=_SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
