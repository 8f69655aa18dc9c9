"""Multimodal blob plumbing: deterministic stubs, strict-mode codec gating,
Arrow batch iteration, and blob-pruning plan shape."""

from __future__ import annotations

import pandas as pd
import pytest

from news_crawler_slm_spark.functions import multimodal as MM


def test_decode_image_meta_deterministic():
    data = b"x" * 1000
    assert MM.decode_image_meta(data) == (16 + 1000 % 625, 16 + 7000 % 465, 3, 1000)
    assert MM.decode_image_meta(data) == MM.decode_image_meta(bytes(data))
    assert MM.decode_image_meta(None) is None


def test_strict_mode_requires_real_codec():
    # PIL is not installed in this container: strict decode must refuse
    # loudly rather than silently return fake values.
    with pytest.raises(NotImplementedError):
        MM.decode_image_meta(b"abc", strict=True)


def test_frame_offsets_semantics():
    # 10 frames of 256 bytes, stride 4 -> frames 0,4,8 sampled
    data = b"\x00" * (256 * 10 + 100)
    n_frames, n_sampled, offsets = MM.frame_offsets(data, 256, 4)
    assert (n_frames, n_sampled) == (10, 3)
    assert offsets == [0, 4 * 256, 8 * 256]
    assert MM.frame_offsets(b"", 256, 4) == (0, 0, [])


def test_batch_iterators_bounded():
    pdf = pd.DataFrame({"doc_id": [1, 2], "blob": [b"a" * 300, b"b" * 512]})
    out = list(MM.image_meta_batches(iter([pdf, pdf])))
    assert len(out) == 2 and list(out[0]["n_bytes"]) == [300, 512]
    rs = list(MM.resize_batches(8, 8)(iter([pdf[["doc_id"]]])))[0]
    # resized corners of synth_png(doc_id): pixel(i,j) =
    # (31*((i*h)//8) + 17*((j*w)//8) + id) % 256, w = 16+id%13, h = 16+id%7
    for row in rs.itertuples():
        d = row.doc_id
        w, h = 16 + d % 13, 16 + d % 7
        px = lambda i, j: (31 * ((i * h) // 8) + 17 * ((j * w) // 8) + d) % 256  # noqa: E731
        assert (row.p00, row.p07, row.p70, row.p77) == (
            px(0, 0), px(0, 7), px(7, 0), px(7, 7),
        )
        assert row.px_sum == sum(px(i, j) for i in range(8) for j in range(8))


def test_blob_pruned_before_shuffle(spark):
    """audio_duration_by_lang must not carry the binary column into the
    aggregate exchange: the blob dies in the pre-shuffle projection."""
    from news_crawler_slm_spark.plans import REGISTRY

    df = REGISTRY["audio_duration_by_lang"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = plan[plan.index("Exchange"):] if "Exchange" in plan else ""
    assert "blob" not in ex


# ---------------------------------------------------------------------------
# The real stdlib PNG/PPM codec (functions/png.py, r06)
# ---------------------------------------------------------------------------


def _hand_png(ihdr_fields, scanlines, extra=b""):
    """Build a PNG BY HAND in the test (raw struct/zlib, independent of
    the library under test) so decode is checked against the spec, not
    against encode."""
    import struct
    import zlib

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields))
        + extra
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def test_png_decode_hand_built_filters_golden():
    """Spec-grounding goldens: hand-filtered scanlines (Sub/Up/Average/
    Paeth computed by hand per RFC 2083 §6) must decode to the intended
    pixels."""
    import numpy as np

    from news_crawler_slm_spark.functions import png as PNG

    # filter 1 (Sub), gray 3x1: pixels [5, 10, 255]
    img = PNG.decode_png(_hand_png((3, 1, 8, 0, 0, 0, 0), b"\x01\x05\x05\xf5"))
    assert img.shape == (1, 3, 1) and list(img[0, :, 0]) == [5, 10, 255]
    # filter 2 (Up), gray 2x2: row0 [10,20] raw, row1 [30,45] as deltas
    img = PNG.decode_png(
        _hand_png((2, 2, 8, 0, 0, 0, 0), b"\x00\x0a\x14" + b"\x02\x14\x19")
    )
    assert list(img[1, :, 0]) == [30, 45]
    # filter 3 (Average), gray 2x2: row1 [30,40] -> hand deltas [25,15]
    img = PNG.decode_png(
        _hand_png((2, 2, 8, 0, 0, 0, 0), b"\x00\x0a\x14" + b"\x03\x19\x0f")
    )
    assert list(img[1, :, 0]) == [30, 40]
    # filter 4 (Paeth), gray 2x2: row1 [15,25] -> hand deltas [5,5]
    img = PNG.decode_png(
        _hand_png((2, 2, 8, 0, 0, 0, 0), b"\x00\x0a\x14" + b"\x04\x05\x05")
    )
    assert list(img[1, :, 0]) == [15, 25]
    # palette (type 3): PLTE with 4 colors, indices [0, 3, 1]
    import struct
    import zlib

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
    plte_chunk = (
        struct.pack(">I", len(plte)) + b"PLTE" + plte
        + struct.pack(">I", zlib.crc32(b"PLTE" + plte) & 0xFFFFFFFF)
    )
    img = PNG.decode_png(
        _hand_png((3, 1, 8, 3, 0, 0, 0), b"\x00\x00\x03\x01", extra=plte_chunk)
    )
    assert img.shape == (1, 3, 3)
    assert [list(p) for p in img[0]] == [[255, 0, 0], [7, 8, 9], [0, 255, 0]]
    np.testing.assert_array_equal(img, img)  # keep numpy import used


def test_png_roundtrip_every_filter_and_color_type():
    """encode -> decode identity for all 5 filter types x gray/gray-alpha/
    RGB/RGBA, on a gradient+noise image that makes each filter nontrivial."""
    import numpy as np

    from news_crawler_slm_spark.functions import png as PNG

    rng = np.random.RandomState(7)
    for ch in (1, 2, 3, 4):
        base = rng.randint(0, 256, size=(13, 17, ch)).astype(np.uint8)
        grad = (np.arange(13)[:, None, None] * 9 + np.arange(17)[None, :, None] * 5) % 256
        img = ((base.astype(int) + grad) % 256).astype(np.uint8)
        for ft in range(5):
            out = PNG.decode_png(PNG.encode_png(img, filter_type=ft))
            np.testing.assert_array_equal(out, img)


def test_ppm_roundtrip_and_comment_header():
    import numpy as np

    from news_crawler_slm_spark.functions import png as PNG

    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    np.testing.assert_array_equal(PNG.decode_ppm(PNG.encode_ppm(img)), img)
    # comment lines in the header are legal P6
    hand = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    np.testing.assert_array_equal(PNG.decode_ppm(hand), img)


def test_resize_nearest_golden_and_envelope_errors():
    import numpy as np
    import pytest as _pytest

    from news_crawler_slm_spark.functions import multimodal as MMod
    from news_crawler_slm_spark.functions import png as PNG

    arr = np.arange(16, dtype=np.uint8).reshape(4, 4)
    np.testing.assert_array_equal(
        PNG.resize_nearest(arr, 2, 2), np.array([[0, 2], [8, 10]], np.uint8)
    )
    # out-of-envelope: 16-bit depth refuses
    with _pytest.raises(PNG.PngFormatError):
        PNG.decode_png(_hand_png((1, 1, 16, 0, 0, 0, 0), b"\x00\x00\x00"))
    # JPEG magic: resize_image maps to CodecUnavailable (strict honesty)
    with _pytest.raises(MMod.CodecUnavailable):
        MMod.resize_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32, 8, 8)
    # real resize roundtrip: PNG in -> resized PNG out, pixels exact
    img = ((np.arange(12)[:, None] * 31 + np.arange(10)[None, :] * 17) % 256).astype(np.uint8)
    out = MMod.resize_image(PNG.encode_png(img, filter_type=4), 5, 6)
    np.testing.assert_array_equal(
        PNG.decode_png(out)[:, :, 0], PNG.resize_nearest(img, 5, 6)
    )
    # decode_image_meta reports REAL dims for PNG (not the fake header)
    assert MMod.decode_image_meta(PNG.encode_png(img))[:3] == (10, 12, 1)


def test_wav_roundtrip_both_depths_and_stereo():
    import numpy as np

    from news_crawler_slm_spark.functions import wav as WAV

    mono = (np.arange(40, dtype=np.int64) * 37) % 4096 - 2048
    arr, rate, depth = WAV.decode_wav(WAV.encode_wav(mono, 8000, 16))
    assert (rate, depth, arr.shape) == (8000, 16, (40, 1))
    np.testing.assert_array_equal(arr[:, 0], mono)
    # 8-bit: centered convention survives the unsigned storage bias
    small = (np.arange(33, dtype=np.int64) * 7) % 256 - 128
    arr8, rate8, depth8 = WAV.decode_wav(WAV.encode_wav(small, 44100, 8))
    assert (rate8, depth8) == (44100, 8)
    np.testing.assert_array_equal(arr8[:, 0], small)
    # stereo interleave roundtrips column-exact
    st = np.stack([mono, mono[::-1]], axis=1)
    arr2, _, _ = WAV.decode_wav(WAV.encode_wav(st, 16000, 16))
    np.testing.assert_array_equal(arr2, st)


def test_wav_rejects_out_of_envelope():
    import struct

    import numpy as np
    import pytest as _pytest

    from news_crawler_slm_spark.functions import wav as WAV

    good = WAV.encode_wav(np.zeros(8, np.int64), 8000, 16)
    with _pytest.raises(WAV.WavFormatError):
        WAV.decode_wav(b"RIFX" + good[4:])  # wrong magic
    with _pytest.raises(WAV.WavFormatError):
        WAV.decode_wav(good[:20])  # missing data chunk
    # non-PCM format code refuses (IEEE float = 3)
    bad = bytearray(good)
    (fmt_off,) = [i for i in range(len(bad)) if bad[i : i + 4] == b"fmt "]
    bad[fmt_off + 8 : fmt_off + 10] = struct.pack("<H", 3)
    with _pytest.raises(WAV.WavFormatError):
        WAV.decode_wav(bytes(bad))
    # truncated data payload refuses
    data_off = good.index(b"data")
    with _pytest.raises(WAV.WavFormatError):
        WAV.decode_wav(good[: data_off + 8] + good[data_off + 8 : -1])
    with _pytest.raises(WAV.WavFormatError):
        WAV.encode_wav(np.zeros(4, np.int64), 8000, 24)


def test_wav_resample_golden_and_synth_formula():
    import numpy as np

    from news_crawler_slm_spark.functions import wav as WAV

    arr = np.arange(10, dtype=np.int64)[:, None]
    # floor map j*10//4 -> indices 0,2,5,7
    np.testing.assert_array_equal(
        WAV.resample_nearest(arr, 4)[:, 0], np.array([0, 2, 5, 7])
    )
    # synth_wav obeys the documented arithmetic for both parities
    for d in (6, 7):
        samples, rate, depth = WAV.decode_wav(MM.synth_wav(d))
        n = 64 + d % 49
        assert (rate, depth, samples.shape[0]) == (8000, 16 if d % 2 == 0 else 8, n)
        i = np.arange(n, dtype=np.int64)
        want = (37 * i + 13 * d) % (4096 if d % 2 == 0 else 256)
        want -= 2048 if d % 2 == 0 else 128
        np.testing.assert_array_equal(samples[:, 0], want)
