"""WARC 1.0 source and sink (ISO 28500) — the interchange format for web
crawls (Common Crawl, Heritrix, wget --warc). Implemented from scratch on
the public spec; no external WARC library.

The reference stores fetched articles as per-publisher JSONL
(data_extraction/crawl_articles.py:29-46) — fine for one laptop, but the
archival/interchange form of a crawl at scale is WARC, and this engine's
canonical ``pages`` table already carries ``warc_ts`` (schemas.py:13,
BASELINE.json input_hint). This module closes the loop: export any pages
DataFrame to standard WARC files and scan WARC files back into the typed
pages shape.

Scale shape
-----------
- **Sink**: one WARC file per input partition, written executor-side
  (same discipline as BloomStore blobs) via ``mapInPandas`` — the driver
  sees only a tiny per-file manifest (path, record count, bytes). Callers
  control file sizing with ``df.repartition(n)``; WARC convention is ~1 GB
  per file (Common Crawl segments).
- **Source**: ``binaryFile`` scan — each WARC file is one task, the unit
  of parallelism Common Crawl itself uses (a 100 TB crawl is ~100k files
  read by independent tasks; no shuffle). Parsing is a single linear pass
  with length-delimited block reads: body bytes are NEVER scanned for
  record boundaries, so payloads containing ``WARC/1.0`` decoys cannot
  confuse the reader (tested). ``binaryFile`` holds one whole file in
  executor memory — keep files at the conventional ~1 GB.

Determinism: record ids are uuid5 of (target-uri, date) — re-exporting
the same table yields byte-identical files (no wall clock, no random
uuid4); WARC-Date comes from the ``warc_ts`` column, never from now().

Round-trip contract (tests/test_warc.py): ``read_warc(write_warc(pages))``
restores (url, warc_ts, html, lang, publisher) exactly, including NULL
timestamps and arbitrary binary payloads.
"""

from __future__ import annotations

import gzip
import io
import os
import uuid
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"
_EPOCH_FMT = "%Y-%m-%dT%H:%M:%S.%fZ"
# extension field restoring a NULL warc_ts on read (WARC-Date is mandatory
# per spec, so NULL is encoded as epoch + this marker)
_NULL_TS = "X-Engine-Null-Date"

MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"

READ_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("publisher", T.StringType(), True),
        T.StructField("record_id", T.StringType(), False),
        T.StructField("warc_file", T.StringType(), False),
    ]
)


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _fmt_date(micros: int | None) -> str:
    # exact integer arithmetic — float seconds lose sub-microsecond
    # precision at current epochs and would break byte-identical re-export
    from datetime import timedelta

    return (_EPOCH + timedelta(microseconds=micros or 0)).strftime(_EPOCH_FMT)


def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = b"WARC/1.0" + _CRLF
    for k, v in headers:
        head += f"{k}: {v}".encode("utf-8") + _CRLF
    head += f"Content-Length: {len(block)}".encode() + _CRLF
    return head + _CRLF + block + _CRLF + _CRLF


def _response_record(
    url: str, micros: int | None, html: bytes | None, lang, publisher
) -> bytes:
    date = _fmt_date(micros)
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}|{date}")
    headers = [
        ("WARC-Type", "resource"),
        ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
        ("WARC-Date", date),
        ("WARC-Target-URI", url),
        ("Content-Type", "text/html; charset=utf-8"),
    ]
    if micros is None:
        headers.append((_NULL_TS, "1"))
    if lang is not None and not (isinstance(lang, float) and pd.isna(lang)):
        headers.append(("X-Engine-Lang", str(lang)))
    if publisher is not None and not (
        isinstance(publisher, float) and pd.isna(publisher)
    ):
        headers.append(("X-Engine-Publisher", str(publisher)))
    return _record(headers, bytes(html) if html is not None else b"")


def _warcinfo(filename: str) -> bytes:
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"warcinfo|{filename}")
    body = (
        b"software: news-crawler-slm-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
    )
    return _record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:uuid:{rid}>"),
            ("WARC-Date", _fmt_date(0)),
            ("WARC-Filename", filename),
            ("Content-Type", "application/warc-fields"),
        ],
        body,
    )


def write_warc(
    df: DataFrame, out_dir: str, compress: bool = False
) -> "pd.DataFrame":
    """Export ``df`` (pages shape: url, warc_ts, html, optional lang /
    publisher) to ``out_dir`` as one ``part-NNNNN.warc[.gz]`` per
    partition, executor-side. Returns the collected manifest (path,
    n_records, n_bytes per file — O(files) driver rows only). Partitions
    are written independently; a re-export of the same partitioning is
    byte-identical (deterministic ids and dates)."""
    os.makedirs(out_dir, exist_ok=True)
    cols = [F.col("url"), F.unix_micros(F.col("warc_ts")).alias("ts_us"), F.col("html")]
    have = set(df.columns)
    cols.append(F.col("lang") if "lang" in have else F.lit(None).cast("string").alias("lang"))
    cols.append(
        F.col("publisher")
        if "publisher" in have
        else F.lit(None).cast("string").alias("publisher")
    )
    slim = df.select(*cols)
    ext = ".warc.gz" if compress else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = f"part-{pid:05d}{ext}"
        path = os.path.join(out_dir, fname)
        buf = io.BytesIO()
        buf.write(_warcinfo(fname))
        n = 0
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                ts = None if pd.isna(r.ts_us) else int(r.ts_us)
                buf.write(_response_record(r.url, ts, r.html, r.lang, r.publisher))
                n += 1
        raw = buf.getvalue()
        if compress:
            # mtime pinned for byte-identical re-export
            raw = gzip.compress(raw, mtime=0)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(raw)
        os.replace(tmp, path)
        yield pd.DataFrame({"path": [path], "n_records": [n], "n_bytes": [len(raw)]})

    return slim.mapInPandas(_write, MANIFEST_SCHEMA).toPandas()


def _parse_warc_bytes(raw: bytes, path: str):
    """Linear length-delimited parse of one WARC file; yields row tuples
    for every ``resource``/``response`` record."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record padding
        while pos < n and raw[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        eol = raw.index(b"\r\n", pos)
        version = raw[pos:eol]
        if not version.startswith(b"WARC/"):
            raise ValueError(f"{path}: bad record header at byte {pos}: {version!r}")
        head_end = raw.index(b"\r\n\r\n", eol)
        headers: dict[str, str] = {}
        for line in raw[eol + 2 : head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            headers[k.strip().decode("utf-8").lower()] = v.strip().decode("utf-8")
        length = int(headers["content-length"])
        block = raw[head_end + 4 : head_end + 4 + length]
        pos = head_end + 4 + length
        if raw[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError(f"{path}: missing record terminator at byte {pos}")
        pos += 4
        if headers.get("warc-type") not in ("resource", "response"):
            continue
        ts_us = None
        if headers.get(_NULL_TS.lower()) != "1":
            dt = datetime.strptime(headers["warc-date"], _EPOCH_FMT).replace(
                tzinfo=timezone.utc
            )
            td = dt - _EPOCH
            ts_us = (td.days * 86400 + td.seconds) * 10**6 + td.microseconds
        rid = headers["warc-record-id"].strip("<>").removeprefix("urn:uuid:")
        yield (
            headers["warc-target-uri"],
            ts_us,
            block,
            headers.get("x-engine-lang"),
            headers.get("x-engine-publisher"),
            rid,
            path,
        )


def _parsed_frame(bin_df: DataFrame) -> DataFrame:
    """(path, content) binary rows -> typed pages rows; shared by the
    batch scan and the streaming reader."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                raw = bytes(r.content)
                if r.path.endswith(".gz"):
                    raw = gzip.decompress(raw)
                rows.extend(_parse_warc_bytes(raw, r.path))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url",
                    "ts_us",
                    "html",
                    "lang",
                    "publisher",
                    "record_id",
                    "warc_file",
                ],
            )

    parsed = bin_df.mapInPandas(
        _parse,
        "url string, ts_us long, html binary, lang string, publisher string,"
        " record_id string, warc_file string",
    )
    return parsed.select(
        "url",
        F.timestamp_micros(F.col("ts_us")).alias("warc_ts"),
        "html",
        "lang",
        "publisher",
        "record_id",
        "warc_file",
    )


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Scan WARC files (plain or .gz) under ``path`` (dir or glob) into
    the typed pages shape (READ_SCHEMA). One task per file — the Common
    Crawl parallelism unit; no shuffle, no schema inference."""
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return _parsed_frame(bin_df)


def read_warc_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Structured-Streaming WARC source: new files landing under ``path``
    become micro-batches of typed pages rows — the archive-drop ingestion
    pattern (a crawler ships finished .warc.gz segments into a directory;
    downstream consumes them exactly-once via the stream checkpoint).
    ``maxFilesPerTrigger`` bounds micro-batch size at scale. Composes with
    streaming/ingest.py windowed aggregations on ``warc_ts`` and the
    stateful first-seen dedup (tests/test_warc.py pins stream ≡ batch and
    checkpointed incremental pickup)."""
    # streaming sources require an explicit schema; binaryFile's is fixed
    bin_schema = T.StructType(
        [
            T.StructField("path", T.StringType(), False),
            T.StructField("modificationTime", T.TimestampType(), False),
            T.StructField("length", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(bin_schema)
        .option("pathGlobFilter", "*.warc*")
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    bin_df = reader.load(path).select("path", "content")
    return _parsed_frame(bin_df)
