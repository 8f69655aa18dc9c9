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
    rs = list(MM.resize_batches(64, 64)(iter([pdf])))[0]
    assert list(rs["n_px"]) == [64 * 64, 64 * 64]


def test_blob_pruned_before_shuffle(spark):
    """audio_duration_by_lang must not carry the binary column into the
    aggregate exchange: the blob dies in the pre-shuffle projection."""
    from news_crawler_slm_spark.plans import REGISTRY

    df = REGISTRY["audio_duration_by_lang"][0](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    ex = plan[plan.index("Exchange"):] if "Exchange" in plan else ""
    assert "blob" not in ex
