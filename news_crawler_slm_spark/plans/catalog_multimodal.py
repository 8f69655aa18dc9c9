"""Multimodal + embedding-near-dup catalog entries (engine additions; the
reference is text-only — SURVEY.md §2 notes these as the training-data-
pipeline extensions a 100 TB corpus needs).

Blob inputs are synthesized deterministically from the driver's
``documents`` table (blob = utf-8 bytes of ``text``) so no external data is
required and the DuckDB oracle can mirror every byte-length computation
with ``octet_length(encode(text))``.

Scale notes: blobs never shuffle — every op prunes to metadata columns
immediately after the Arrow decode stage; the near-dup self-join is blocked
by ``label`` (IVF-style bucketing: at 100 TB the blocker is a coarse
quantizer / LSH band, same plan shape, bounded pair growth per block).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import multimodal as MM
from .catalog import _spread, _t, register

# cosine threshold for near-duplicate embeddings: chosen mid-gap for the
# synthetic corpus (no pair within 1e-6 of it at sf0.01/sf0.1 — verified),
# so float summation-order differences between engines cannot flip a pair.
NEARDUP_TAU = 0.35


@register(
    "embedding_neardup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(CAST(list_cosine_similarity(
                 CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])
           ) AS DOUBLE), 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_cosine_similarity(
          CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[])) >= {NEARDUP_TAU}
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (dedup family): label-
    blocked self-join + JVM-side cosine (zip_with/aggregate — no Python in
    the hot path). Blocking key = label (stand-in for an IVF/LSH bucket)."""
    # norms are precomputed ONCE per vector before the join (r07): inside
    # the pair stage each vector's norm was re-folded once per pair it
    # appears in — ~|block| redundant interpreted HOF folds per vector;
    # sqrt(fold(v)) is the identical expression over the identical array,
    # so dot/(na*nb) is bit-for-bit the previous value
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    a = e.select(
        F.col("vec_id").alias("id_a"),
        "label",
        F.col("v").alias("va"),
        norm(F.col("v")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"),
        "label",
        F.col("v").alias("vb"),
        norm(F.col("v")).alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    pairs = (
        a.join(b, ["label"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim_raw", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cos_sim_raw") >= NEARDUP_TAU)
    )
    return pairs.select(
        "id_a", "id_b", F.round("cos_sim_raw", 6).alias("cos_sim")
    )


@register(
    "multimodal_image_meta",
    """
    SELECT doc_id,
           16 + (octet_length(encode(text)) % 625) AS width,
           16 + ((octet_length(encode(text)) * 7) % 465) AS height,
           3 AS channels,
           octet_length(encode(text)) AS n_bytes
    FROM documents
    """,
)
def multimodal_image_meta(spark, sf_dir):
    """Typed-metadata extraction from an opaque image blob column via
    mapInPandas (Arrow batches; decode stubbed deterministically —
    functions/multimodal.py). Blob bytes never leave the decode stage."""
    d = _spread(
        _t(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
        ),
        "doc_id",
    )
    return d.mapInPandas(MM.image_meta_batches, MM.IMAGE_META_SCHEMA)


@register(
    "image_resize_png",
    """
    WITH dims AS (
      SELECT doc_id, 16 + doc_id % 13 AS w, 16 + doc_id % 7 AS h
      FROM documents
    ),
    grid AS (
      SELECT d.doc_id,
             i.i, j.j,
             (31 * ((i.i * d.h) // 8) + 17 * ((j.j * d.w) // 8) + d.doc_id)
               % 256 AS px
      FROM dims d
      CROSS JOIN (SELECT unnest(range(8)) AS i) i
      CROSS JOIN (SELECT unnest(range(8)) AS j) j
    )
    SELECT doc_id,
           8 AS out_w, 8 AS out_h,
           CAST(max(CASE WHEN i = 0 AND j = 0 THEN px END) AS INTEGER) AS p00,
           CAST(max(CASE WHEN i = 0 AND j = 7 THEN px END) AS INTEGER) AS p07,
           CAST(max(CASE WHEN i = 7 AND j = 0 THEN px END) AS INTEGER) AS p70,
           CAST(max(CASE WHEN i = 7 AND j = 7 THEN px END) AS INTEGER) AS p77,
           CAST(sum(px) AS BIGINT) AS px_sum
    FROM grid GROUP BY doc_id
    """,
)
def image_resize_png(spark, sf_dir):
    """REAL image resize over a REAL stdlib PNG codec (functions/png.py,
    r06 — this retired the engine's last stubbed decode): per document a
    deterministic grayscale PNG is synthesized (pixels arithmetic in
    (doc_id, row, col); filter type doc_id % 5 so the corpus exercises
    all five PNG filters), then resize_image runs the full inflate ->
    unfilter -> nearest-neighbor -> re-encode roundtrip inside
    mapInPandas, the output is decoded AGAIN, and the corner pixels +
    pixel sum are reported. The DuckDB oracle recomputes every value from
    the arithmetic alone — the roundtrip must be bit-exact to go green.
    JPEG / out-of-envelope shapes still raise CodecUnavailable
    (strict-mode honesty; tests/test_multimodal.py).

    Scale shape: blob bytes are born and die inside one Arrow batch in
    one task — no shuffle ever carries a blob; output is 8 scalar columns
    per doc.  The codec stage is the most expensive per-row Python work
    in the catalog, so the doc_id feed is _spread across the cores when
    the input is row-group-limited (r07: 56.5 s -> ~2 s at sf1.0; the
    8-byte-per-row exchange is a no-op on an already-split input)."""
    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    return d.mapInPandas(MM.resize_batches(8, 8), MM.RESIZE_SCHEMA)


@register(
    "audio_decode_wav",
    """
    WITH dims AS (
      SELECT doc_id, 64 + doc_id % 49 AS n,
             CASE WHEN doc_id % 2 = 0 THEN 16 ELSE 8 END AS depth
      FROM documents
    ),
    grid AS (
      SELECT d.doc_id, d.n, d.depth, j.j, (j.j * d.n) // 16 AS i
      FROM dims d CROSS JOIN (SELECT unnest(range(16)) AS j) j
    ),
    vals AS (
      SELECT doc_id, n, depth, j,
             CASE WHEN depth = 16
                  THEN (37 * i + 13 * doc_id) % 4096 - 2048
                  ELSE (37 * i + 13 * doc_id) % 256 - 128 END AS s
      FROM grid
    )
    SELECT doc_id,
           CAST(max(n) AS INTEGER) AS n_samples,
           8000 AS sample_rate,
           CAST(max(depth) AS INTEGER) AS bit_depth,
           16 AS out_n,
           CAST(max(CASE WHEN j = 0 THEN s END) AS INTEGER) AS s_first,
           CAST(max(CASE WHEN j = 15 THEN s END) AS INTEGER) AS s_last,
           CAST(sum(s) AS BIGINT) AS s_sum,
           CAST(sum(abs(s)) AS BIGINT) AS s_abs_sum
    FROM vals GROUP BY doc_id
    """,
)
def audio_decode_wav(spark, sf_dir):
    """REAL audio decode over a REAL stdlib WAV codec (functions/wav.py,
    r06 — the audio twin of `image_resize_png`, retiring the byte-math
    fake for RIFF/PCM blobs): per document a deterministic mono clip is
    synthesized (samples arithmetic in (doc_id, index); bit depth 16 for
    even ids / 8 for odd so the corpus exercises both PCM layouts), then
    the full encode -> RIFF chunk walk -> PCM extract -> nearest-neighbor
    resample -> re-encode -> decode-AGAIN roundtrip runs inside
    mapInPandas, and first/last samples + sum/abs-sum of the resampled
    clip are reported. The DuckDB oracle recomputes every value from the
    arithmetic alone — the roundtrip must be bit-exact to go green.
    Non-PCM / truncated streams raise WavFormatError (strict-mode
    honesty; tests/test_multimodal.py).

    Scale shape: blob bytes are born and die inside one Arrow batch in
    one task — no shuffle ever carries a blob; output is 9 scalar columns
    per doc.  Like the PNG twin, the doc_id feed is _spread across the
    cores when the input is row-group-limited (no-op on split inputs)."""
    d = _spread(_t(spark, sf_dir, "documents").select("doc_id"), "doc_id")
    return d.mapInPandas(MM.wav_batches(16), MM.WAV_SCHEMA)


@register(
    "frame_sample_stats",
    """
    SELECT doc_id,
           CAST(floor(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_frames,
           CAST(ceil(floor(octet_length(encode(text)) / 256.0) / 4.0) AS INTEGER)
             AS n_sampled
    FROM documents
    """,
)
def frame_sample_stats(spark, sf_dir):
    """Video frame-sampling plumbing: fixed-size fake frames, stride-4
    sampling inside mapInPandas; downstream sees only frame counts."""
    d = _spread(
        _t(spark, sf_dir, "documents").select(
            "doc_id", F.encode(F.col("text"), "utf-8").alias("blob")
        ),
        "doc_id",
    )
    out = d.mapInPandas(MM.frame_batches(256, 4), MM.FRAME_SCHEMA)
    return out.select("doc_id", "n_frames", "n_sampled")


@register(
    "audio_duration_by_lang",
    """
    SELECT lang,
           count(*) AS n_clips,
           round(CAST(sum(CAST(floor(octet_length(encode(text)) / 2.0) AS BIGINT))
                      AS BIGINT) / 16000.0, 6) AS total_duration_s
    FROM documents
    GROUP BY lang
    """,
)
def audio_duration_by_lang(spark, sf_dir):
    """Audio metadata aggregation: fake 16-bit PCM duration per clip, then
    a metadata-only groupBy — blob column pruned before the shuffle."""
    d = _t(spark, sf_dir, "documents").select(
        "lang", F.encode(F.col("text"), "utf-8").alias("blob")
    )
    # exact integer sample counts summed first (order-independent), one
    # float division at the end — catalog.py numeric-identity convention
    dur = d.select(
        "lang",
        (F.length("blob").cast("long") / F.lit(2)).cast("long").alias("n_samples"),
    )
    return dur.groupBy("lang").agg(
        F.count("*").alias("n_clips"),
        F.round(F.sum("n_samples") / F.lit(16000.0), 6).alias("total_duration_s"),
    )
