"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-vectorized stages.

The reference has no multimodal path (text/HTML only — its record schema is
the dict at /root/reference/data_extraction/crawl_articles.py:14-21); these
are the engine additions a large-scale training-data pipeline needs. The
Spark-side plumbing — schemas, batch iteration, partitioning — is real and
tested. Codecs: PNG and binary PPM decode/encode/resize are REAL
(functions/png.py — pure stdlib zlib+struct, r06); JPEG and everything
else outside that envelope still needs a library (PIL/libsndfile/ffmpeg)
that is NOT available in this container, so those decodes fall back to a
deterministic fake derived from the bytes (``strict=True`` raises
CodecUnavailable instead, marking exactly where a real deployment plugs
the codec in).

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

    PNG and binary PPM decode REAL headers (functions/png.py). Other
    formats: strict=True demands a real decoder (PIL) and raises
    CodecUnavailable when absent; default falls back to the deterministic
    fake."""
    from . import png as PNG

    if data is None:
        return None
    if PNG.is_png(data):
        img = PNG.decode_png(data)
        return img.shape[1], img.shape[0], img.shape[2], len(data)
    if PNG.is_ppm(data):
        img = PNG.decode_ppm(data)
        return img.shape[1], img.shape[0], 3, len(data)
    if strict and not _HAS_PIL:
        raise CodecUnavailable("non-PNG/PPM decode requires PIL; not installed here")
    w, h, c = _fake_dims(data)
    return w, h, c, len(data)


def resize_image(data: bytes | None, out_w: int, out_h: int) -> bytes | None:
    """REAL resize for PNG/PPM blobs: decode (functions/png.py) ->
    nearest-neighbor resample -> re-encode in the same container format.
    Formats outside the stdlib envelope (JPEG, 16-bit/interlaced PNG)
    raise CodecUnavailable — the honest boundary of an offline container."""
    from . import png as PNG

    if data is None:
        return None
    try:
        if PNG.is_png(data):
            return PNG.encode_png(PNG.resize_nearest(PNG.decode_png(data), out_w, out_h))
        if PNG.is_ppm(data):
            return PNG.encode_ppm(PNG.resize_nearest(PNG.decode_ppm(data), out_w, out_h))
    except PNG.PngFormatError as exc:
        raise CodecUnavailable(str(exc)) from exc
    raise CodecUnavailable("resize supports PNG/PPM here; JPEG needs PIL")


def synth_png(doc_id: int) -> bytes:
    """Deterministic test image: grayscale W×H PNG whose every pixel is
    arithmetic in (doc_id, row, col) — W = 16 + id%13, H = 16 + id%7,
    pixel(r, c) = (31r + 17c + id) % 256 — encoded with filter type
    id % 5, so the corpus exercises ALL five PNG filters through the real
    deflate/unfilter path while staying SQL-recomputable."""
    d = int(doc_id)
    from . import png as PNG

    w, h = 16 + d % 13, 16 + d % 7
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    img = ((31 * r + 17 * c + d) % 256).astype(np.uint8)
    return PNG.encode_png(img, filter_type=d % 5)


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


RESIZE_SCHEMA = (
    "doc_id long, out_w int, out_h int, p00 int, p07 int, p70 int, p77 int, "
    "px_sum long"
)


def resize_batches(out_w: int, out_h: int):
    """REAL resize stage over synthesized PNG blobs: encode (all five
    filter types across the corpus) -> resize_image (inflate, unfilter,
    nearest-neighbor resample, re-encode) -> decode AGAIN, and report the
    four corner pixels + the full pixel sum of the resized image. Every
    reported value is arithmetic in doc_id (synth_png pixels + the
    floor-mapping resampler), which is what gives the catalog query a
    full DuckDB value oracle over a genuine codec roundtrip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import png as PNG

        for pdf in batches:
            recs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                out = resize_image(synth_png(d), out_w, out_h)
                arr = PNG.decode_png(out)[:, :, 0].astype(np.int64)
                recs.append(
                    (
                        d,
                        out_w,
                        out_h,
                        int(arr[0, 0]),
                        int(arr[0, -1]),
                        int(arr[-1, 0]),
                        int(arr[-1, -1]),
                        int(arr.sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "out_w", "out_h", "p00", "p07", "p70", "p77",
                    "px_sum",
                ],
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


def synth_wav(doc_id: int) -> bytes:
    """Deterministic test clip: mono PCM WAV whose every sample is
    arithmetic in (doc_id, index) — n = 64 + id%49, rate 8000, bit depth
    16 when id is even / 8 when odd, so the corpus exercises BOTH depths
    through the real RIFF encode/decode path while staying
    SQL-recomputable: s16(i) = (37i + 13·id) % 4096 - 2048,
    s8(i) = (37i + 13·id) % 256 - 128."""
    from . import wav as WAV

    d = int(doc_id)
    n = 64 + d % 49
    i = np.arange(n, dtype=np.int64)
    if d % 2 == 0:
        samples = (37 * i + 13 * d) % 4096 - 2048
        return WAV.encode_wav(samples, 8000, bit_depth=16)
    samples = (37 * i + 13 * d) % 256 - 128
    return WAV.encode_wav(samples, 8000, bit_depth=8)


WAV_SCHEMA = (
    "doc_id long, n_samples int, sample_rate int, bit_depth int, out_n int, "
    "s_first int, s_last int, s_sum bigint, s_abs_sum bigint"
)


def wav_batches(out_n: int):
    """REAL audio stage over synthesized WAV blobs: encode (both bit
    depths across the corpus) -> decode (RIFF chunk walk, PCM extraction)
    -> nearest-neighbor resample to ``out_n`` -> re-encode at the decoded
    depth -> decode AGAIN, and report first/last samples plus the sum and
    abs-sum of the resampled clip. Every reported value is arithmetic in
    doc_id (synth_wav samples + the floor index map), which is what gives
    the catalog query ``audio_decode_wav`` a full DuckDB value oracle
    over a genuine codec roundtrip."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from . import wav as WAV

        for pdf in batches:
            recs = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                samples, rate, depth = WAV.decode_wav(synth_wav(d))
                res = WAV.resample_nearest(samples, out_n)
                rt, rt_rate, rt_depth = WAV.decode_wav(
                    WAV.encode_wav(res[:, 0], rate, bit_depth=depth)
                )
                assert rt_rate == rate and rt_depth == depth
                clip = rt[:, 0].astype(np.int64)
                recs.append(
                    (
                        d,
                        int(samples.shape[0]),
                        rate,
                        depth,
                        out_n,
                        int(clip[0]),
                        int(clip[-1]),
                        int(clip.sum()),
                        int(np.abs(clip).sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "doc_id", "n_samples", "sample_rate", "bit_depth",
                    "out_n", "s_first", "s_last", "s_sum", "s_abs_sum",
                ],
            )

    return run
