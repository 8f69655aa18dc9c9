"""Pure-stdlib WAV (RIFF/WAVE PCM) codec and a deterministic
nearest-neighbor resampler.

This gives the engine's audio column a REAL decode path — the same
graduation functions/png.py gave images in r06: the fake
``audio_meta`` byte-math stays for opaque blobs, but synthesized WAV
blobs now go through a genuine RIFF chunk walk (struct header parsing,
fmt validation, PCM sample extraction) instead of ``len(data) // 2``.

Envelope (strict about what an offline container can honestly decode):
RIFF/WAVE with a ``fmt `` chunk of audio format 1 (PCM), bit depth 8
(unsigned, stored biased by +128) or 16 (signed little-endian), any
channel count / sample rate; anything else — IEEE float, ADPCM, missing
chunks, truncated data — raises :class:`WavFormatError`, which the
multimodal layer maps onto the same strict/lenient contract as images.

The resampler is the audio twin of png.py's image resampler: index
mapping ``src = j * n_in // n_out`` (pure integer floor arithmetic), so
every resampled value is SQL-recomputable from the synthesis formula —
that is what gives the catalog query ``audio_decode_wav`` a full DuckDB
value oracle over a genuine encode -> decode -> resample -> re-encode ->
decode roundtrip.

Reference parity note: the reference has no audio surface at all (its
pipeline is text-only — /root/reference/data_ops/step_03_clean_html.py);
this is an engine addition for multimodal training-data pipelines.

Tests: tests/test_multimodal.py (roundtrip bit-exactness for both bit
depths, stereo interleave, resample goldens, malformed-header rejects).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "WavFormatError",
    "is_wav",
    "encode_wav",
    "decode_wav",
    "resample_nearest",
]


class WavFormatError(ValueError):
    """Malformed or out-of-envelope WAV bytes."""


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def encode_wav(samples: np.ndarray, sample_rate: int, bit_depth: int = 16) -> bytes:
    """(n,) mono or (n, ch) int array -> RIFF/WAVE PCM bytes.

    Samples are CENTERED integers in both depths (the decoder returns the
    same convention): 16-bit writes them as signed LE int16; 8-bit writes
    ``samples + 128`` as unsigned bytes per the WAV spec.
    """
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    if bit_depth == 16:
        raw = arr.astype("<i2").tobytes()
    elif bit_depth == 8:
        raw = (arr.astype(np.int32) + 128).astype(np.uint8).tobytes()
    else:
        raise WavFormatError(f"unsupported bit depth {bit_depth}")
    block_align = ch * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block_align, block_align,
        bit_depth,
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(raw)) + raw
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        yield cid, data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV bytes -> ((n, ch) int32 CENTERED samples, sample_rate, bit_depth).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/fact in
    the stream, as real encoders emit), validates the PCM envelope, and
    rejects truncated data payloads.
    """
    if not is_wav(data):
        raise WavFormatError("not a RIFF/WAVE stream")
    fmt = None
    raw = None
    for cid, body in _chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavFormatError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data" and raw is None:
            raw = body
    if fmt is None or raw is None:
        raise WavFormatError("missing fmt or data chunk")
    audio_format, ch, sample_rate, _, block_align, bit_depth = fmt
    if audio_format != 1:
        raise WavFormatError(f"non-PCM audio format {audio_format}")
    if ch < 1 or block_align != ch * bit_depth // 8:
        raise WavFormatError("inconsistent channel/block layout")
    if bit_depth == 16:
        if len(raw) % (2 * ch):
            raise WavFormatError("truncated 16-bit data chunk")
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int32)
    elif bit_depth == 8:
        if len(raw) % ch:
            raise WavFormatError("truncated 8-bit data chunk")
        arr = np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
    else:
        raise WavFormatError(f"unsupported bit depth {bit_depth}")
    return arr.reshape(-1, ch), sample_rate, bit_depth


def resample_nearest(samples: np.ndarray, out_n: int) -> np.ndarray:
    """(n, ch) -> (out_n, ch) by the floor index map src = j*n // out_n —
    the same integer-exact mapping png.py uses spatially, so oracle SQL
    can recompute every output sample."""
    n = samples.shape[0]
    if n == 0 or out_n <= 0:
        raise WavFormatError("cannot resample empty audio")
    idx = (np.arange(out_n, dtype=np.int64) * n) // out_n
    return samples[idx]
