"""Incremental MinHash near-dup indexing — dedup a NEW crawl increment
against an existing corpus index without re-sketching the corpus.

A continuously-crawling engine (crawl/rounds.py appends pages every
round; the reference appends articles per publisher,
crawl_articles.py:29-46) cannot re-run batch LSH over the full corpus per
increment: at 100 TB that is a daily full-corpus shuffle. The production
pattern is an inverted band index: persist (band, bucket, doc_id) rows
once per document, and per increment (1) sketch ONLY the new docs, (2)
join the new bands against the index to find candidate buckets, (3) emit
pairs that involve at least one new doc, (4) append the new bands to the
index. Increment cost is O(new docs + touched buckets), never O(corpus).

Equivalence contract (tests/test_incremental_dedup.py): feeding a corpus
in any number of increments yields EXACTLY the batch
``minhash_lsh_candidates`` pair set, as long as no (band, bucket) ever
exceeds ``bucket_cap``. The hot-bucket cap is evaluated on the COMBINED
(index + increment) membership of touched buckets; because membership
only grows, cap-crossing is monotone — pairs emitted while a bucket was
still under cap are kept (history is append-only), and the bucket emits
nothing once over cap. Batch, run at the end, would drop that bucket's
early pairs too: incremental output is batch output plus pairs a
boilerplate bucket produced before it was recognizable as boilerplate —
the documented, bounded divergence (each such bucket contributes at most
cap*(cap-1)/2 extra pairs, ever).

Scale shape: every shuffle keys on (band, bucket) — constant width per
doc. The index-side probe is a semi-join on (band, bucket); stored
bucketed on those keys (sources/bucketed.py) it prunes to the touched
buckets without a full index scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INDEX_SCHEMA = "band int, bucket long, doc_id long"

_N_GRAM, _N_HASHES, _BANDS = 3, 16, 4

# One base hash per shingle + N_HASHES linear permutations mod a prime —
# the standard minwise-family construction (Broder 1997): h_i(g) =
# (a_i·h(g) + b_i) mod P. ONE md5 per shingle instead of 16 (measured
# 3.9 s -> ~1 s at sf0.1); every operand stays < 2^60 so the arithmetic
# is exact signed-64 in Spark, DuckDB, and Python alike.
_MH_P = 1_000_000_007


def _mh_params() -> tuple[list[int], list[int]]:
    from ..functions.hashing import md5_long_py

    a = [md5_long_py(f"mh-a{i}") % (_MH_P - 1) + 1 for i in range(_N_HASHES)]
    b = [md5_long_py(f"mh-b{i}") % _MH_P for i in range(_N_HASHES)]
    return a, b


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, h0..h15) minwise signatures for ``docs`` (doc_id, text):
    3-gram shingles -> ONE 60-bit cross-engine base hash per distinct
    shingle (md5_long, functions/hashing.py — bit-identical in Spark/
    DuckDB/Python, which is what gives the batch queries full driver
    value oracles) -> 16 linear-permutation minhashes (a_i·h+b_i mod P,
    Broder's minwise family). Shared by ``minhash_bands`` (LSH banding)
    and the signature-Jaccard estimator
    (plans/catalog_dedup.py:minhash_jaccard_estimates) — one definition,
    so banding and estimation can never drift."""
    from ..functions.hashing import md5_long
    from ..plans.catalog import word_windows, ws_normalize

    mh_a, mh_b = _mh_params()
    toks = docs.select("doc_id", ws_normalize(F.col("text")).alias("norm"))
    grams = (
        toks.select("doc_id", F.explode(word_windows(F.col("norm"), _N_GRAM)).alias("g"))
        .distinct()
    )
    hb = grams.select(
        "doc_id", (md5_long(F.col("g")) % F.lit(_MH_P)).alias("hb")
    )
    return hb.groupBy("doc_id").agg(
        *[
            F.min(
                (F.lit(mh_a[i]) * F.col("hb") + F.lit(mh_b[i])) % F.lit(_MH_P)
            ).alias(f"h{i}")
            for i in range(_N_HASHES)
        ]
    )


def minhash_bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) LSH band rows for ``docs`` (doc_id, text):
    ``minhash_signatures`` -> 4 bands x 4 rows, bucket = md5_long of the
    band's '|'-joined signature slice. The single sketching core shared
    by the batch query (plans/catalog_dedup.py:minhash_lsh_candidates)
    and the incremental index — one definition, so index and batch can
    never drift."""
    return minhash_bands_of(minhash_signatures(docs))


def minhash_bands_of(sigs: DataFrame) -> DataFrame:
    """Band rows from an EXISTING signature frame. Split out so a stage
    that needs BOTH the signatures and their banding (the Jaccard
    estimator, plans/catalog_dedup.py:minhash_jaccard_estimates) defines
    the expensive shingle->md5->min aggregation ONCE and lets Catalyst
    reuse its exchange, instead of sketching the corpus twice."""
    from ..functions.hashing import md5_long

    rows_per_band = _N_HASHES // _BANDS
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            md5_long(
                F.concat_ws(
                    "|",
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("bucket"),
        )
        for b in range(_BANDS)
    ]
    return sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"), "doc_id"
    )


def incremental_neardup(
    index: DataFrame | None, new_docs: DataFrame, bucket_cap: int = 64
) -> tuple[DataFrame, DataFrame]:
    """One dedup increment. ``index``: the persisted band table
    (INDEX_SCHEMA) covering every previously indexed doc, or None for the
    first increment. ``new_docs``: (doc_id, text) of the increment —
    doc_ids must be new (enforce upstream with the url-seen store).

    Returns ``(pairs, new_index)``:
    - ``pairs`` (doc_a < doc_b): candidate near-dup pairs with at least
      one side in the increment — new x indexed and new x new — from
      buckets whose COMBINED membership stays <= bucket_cap;
    - ``new_index``: ``index`` plus the increment's band rows (append —
      persist it for the next increment; at scale, write bucketed on
      (band, bucket) so the next probe prunes).
    """
    new_bands = minhash_bands(new_docs)
    if index is None:
        combined = new_bands.withColumn("is_new", F.lit(True))
    else:
        # probe only the buckets the increment touches: the index side is
        # semi-joined down BEFORE any count or pair work, so a petabyte
        # index costs only its matching buckets (partition-pruned when
        # stored bucketed on these keys)
        touched_old = index.join(
            new_bands.select("band", "bucket").distinct(),
            ["band", "bucket"],
            "left_semi",
        )
        combined = touched_old.withColumn("is_new", F.lit(False)).unionByName(
            new_bands.withColumn("is_new", F.lit(True))
        )

    too_big = (
        combined.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
    )
    capped = combined.join(
        F.broadcast(too_big.select("band", "bucket")), ["band", "bucket"], "left_anti"
    )
    a = capped.where(F.col("is_new")).alias("a")  # pair driver: new docs only
    b = capped.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.least(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_a"),
            F.greatest(F.col("a.doc_id"), F.col("b.doc_id")).alias("doc_b"),
        )
        .distinct()
    )
    new_index = new_bands if index is None else index.unionByName(new_bands)
    return pairs, new_index
