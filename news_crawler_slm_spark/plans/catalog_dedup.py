"""Deduplication, similarity search and crawl-analog plans (the
training-data-pipeline operator family + the frontier primitives expressed
over the driver's oracle-checkable tables).

The sketch family (minhash/LSH, simhash, doc fingerprints, ANN
hyperplanes) hashes with the cross-engine 60-bit md5_long
(functions/hashing.py), so every pair/fingerprint pipeline carries a full
DuckDB value oracle; independent pure-Python twins live in tests/ on top.
Only operators whose keys are LEARNED (k-means cells: ann_ivf_topk,
semdedup_prune) register with oracle=None — the driver records a
rows-only check and their value oracles are numpy twins in tests/.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import md5_long, md5_long_duck
from .catalog import _spread, _t, register, word_windows, ws_normalize

# ===========================================================================
# Dedup family
# ===========================================================================

# Simulated re-crawl: docs 0-49 duplicated under doc_id+10000 — gives the
# exact-dedup plan real work (the corpus itself has no exact dups).
def _bit(i: int) -> int:
    """Signed-64 bit mask for bit i (bit 63 is the sign bit in a Spark long)."""
    return (1 << i) if i < 63 else -(1 << 63)


_DUP_UNION_DUCK = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id < 50
"""


def _dup_union(spark, sf_dir):
    # NOT _spread here: exact_dedup's md5+agg is too cheap to pay a text
    # exchange for (measured r07: 0.26 -> 0.62 s WITH the spread at sf1.0);
    # the explode-heavy consumer (simhash_neardup_pairs) spreads at its
    # own call site instead
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    redup = d.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    return d.unionByName(redup)


@register(
    "exact_dedup",
    f"""
    WITH u AS ({_DUP_UNION_DUCK}),
    g AS (
      SELECT md5(text) AS h, count(*) AS n, min(doc_id) AS keeper
      FROM u GROUP BY md5(text)
    )
    SELECT h, n, keeper FROM g WHERE n > 1
    """,
)
def exact_dedup(spark, sf_dir):
    """Exact dedup via content-hash groupBy: one shuffle on md5(text),
    keeper = min(doc_id) per group. At 100 TB the group key is the hash (64
    hex chars), never the document body — map-side partial agg keeps the
    shuffle tiny."""
    u = _dup_union(spark, sf_dir)
    return (
        u.groupBy(F.md5(F.col("text")).alias("h"))
        .agg(F.count("*").alias("n"), F.min("doc_id").alias("keeper"))
        .where(F.col("n") > 1)
    )


@register(
    "dedup_survivors_count",
    f"SELECT count(DISTINCT md5(text)) AS n_unique FROM ({_DUP_UNION_DUCK})",
)
def dedup_survivors_count(spark, sf_dir):
    u = _dup_union(spark, sf_dir)
    return u.agg(F.count_distinct(F.md5(F.col("text"))).alias("n_unique"))


@register(
    "ngram_jaccard_pairs",
    """
    WITH toks AS (
      SELECT doc_id, source, regexp_split_to_array(trim(text), '\\s+') AS t
      FROM documents
    ), grams0 AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks WHERE len(t) >= 3
    ), grams AS (
      SELECT doc_id, source, g FROM grams0
      WHERE (source, g) IN (SELECT (source, g) FROM grams0
                            GROUP BY source, g HAVING count(*) <= 64)
    ), sizes AS (
      SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS isect
      FROM grams a JOIN grams b ON a.g = b.g AND a.source = b.source
                   AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           round(isect / CAST(sa.sz + sb.sz - isect AS DOUBLE), 6) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = doc_a
               JOIN sizes sb ON sb.doc_id = doc_b
    WHERE isect / CAST(sa.sz + sb.sz - isect AS DOUBLE) >= 0.5
    """,
)
def ngram_jaccard_pairs(spark, sf_dir, df_cap: int = 64):
    """n-gram Jaccard near-dup: distinct 3-gram shingles → inverted-index
    self-join (shuffle key = the shingle, never the document) → per-pair
    intersection counts → |A∩B| / (|A|+|B|-|A∩B|). Blocked by source so the
    candidate-pair blowup stays bounded (at 100 TB the block key is an LSH
    band — see minhash_lsh_candidates).

    Stop-shingle cap (the LSH hot-bucket discipline applied to the exact
    inverted index): a shingle appearing in m docs of one source emits
    m·(m-1)/2 intersection rows — boilerplate shingles make the self-join
    quadratic at web scale, so shingles with per-source document frequency
    over ``df_cap`` are dropped from the index AND the sizes (Jaccard over
    the df-filtered shingle space — what every production similarity index
    does with stop-shingles). Cap chosen invisible to the gate corpus
    (max df = 6 at sf0.1); the DuckDB oracle applies the same HAVING."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", ws_normalize(F.col("text")).alias("norm")
    )
    n = 3
    grams0 = (
        toks.select("doc_id", "source", F.explode(word_windows(F.col("norm"), n)).alias("g"))
        .distinct()
    )
    hot = (
        grams0.groupBy("source", "g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > df_cap)
    )
    from pyspark import StorageLevel

    # over-cap shingles are few by construction (boilerplate) — broadcast
    # ANTI join, mirroring the minhash band-bucket cap. The capped index
    # is consumed by sizes + both self-join sides; left lazy, each
    # consumer re-runs the shingle explode+distinct (the token-universe
    # shuffle) — measured r06: 8 corpus scans. Persist it: this IS the
    # inverted index, the artifact a production similarity pipeline
    # materializes once per corpus version.
    grams = grams0.join(
        F.broadcast(hot.select("source", "g")), ["source", "g"], "left_anti"
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.source") == F.col("b.source"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("isect"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("isect") / (F.col("sa.sz") + F.col("sb.sz") - F.col("isect")).cast("double")
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .where(jac >= 0.5)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def _minhash_cte(bucket_cap: int = 64) -> str:
    """Reusable DuckDB CTE chain (t → g0 → hb → sig → banded → ok →
    capped) — the oracle twin of minhash_signatures + minhash_bands + the
    over-cap drop: the same ONE md5_long base hash per distinct 3-gram
    shingle, the same 16 linear permutations (a_i·h+b_i mod P), the same
    '|'-joined band buckets. Shared by the candidate-pair oracle and the
    signature-Jaccard oracle so the twins can never drift."""
    from ..operators.incremental_dedup import _MH_P, _mh_params

    mh_a, mh_b = _mh_params()
    mins = ",\n             ".join(
        f"min(({mh_a[i]} * hb + {mh_b[i]}) % {_MH_P}) AS h{i}"
        for i in range(16)
    )
    band_cases = "\n        ".join(
        "WHEN {b} THEN {h}".format(
            b=b,
            h=md5_long_duck(
                " || '|' || ".join(
                    f"CAST(h{b * 4 + r} AS VARCHAR)" for r in range(4)
                )
            ),
        )
        for b in range(4)
    )
    return rf"""t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents
    ),
    g0 AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(toks) - 2),
                                   i -> array_to_string(toks[i:i+2], ' '))) AS g
      FROM t WHERE len(toks) >= 3
    ),
    hb AS (
      SELECT doc_id, {md5_long_duck('g')} % {_MH_P} AS hb FROM g0
    ),
    sig AS (
      SELECT doc_id, {mins}
      FROM hb GROUP BY doc_id
    ),
    banded AS (
      SELECT doc_id, band,
             CASE band
        {band_cases}
             END AS bucket
      FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    ok AS (
      SELECT band, bucket FROM banded GROUP BY band, bucket
      HAVING count(*) <= {bucket_cap}
    ),
    capped AS (SELECT b.* FROM banded b JOIN ok USING (band, bucket))"""


def _minhash_oracle_sql(bucket_cap: int = 64) -> str:
    """DuckDB twin of minhash_bands + the capped band-bucket self-join."""
    return rf"""
    WITH {_minhash_cte(bucket_cap)}
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """


@register("minhash_lsh_candidates", _minhash_oracle_sql())
def minhash_lsh_candidates(spark, sf_dir, bucket_cap: int = 64):
    """MinHash + LSH near-dup candidates: 3-gram shingle → one md5_long
    base hash + 16 linear-permutation minhashes (Broder's minwise family;
    cross-engine, so this carries a full DuckDB value oracle) → 4 bands ×
    4 rows → band-bucket join. The
    shuffle key is (band, bucket-hash) — constant width per doc
    regardless of document size; exact Jaccard verification then runs only
    inside candidate pairs.

    Hot-bucket cap: a (band, bucket) holding m docs emits m·(m-1)/2 pairs —
    boilerplate or near-empty documents collapse many docs into one bucket
    and the self-join goes quadratic at web scale (the classic LSH blow-up).
    Buckets over ``bucket_cap`` members are dropped before the join via a
    broadcast ANTI join against the (tiny by construction) over-cap bucket
    set — the same discipline as neardup_components, and what production
    dedup pipelines do (an over-cap bucket is boilerplate, not a near-dup
    signal; its members still meet in their other bands when genuinely
    similar). Cap chosen so the gate corpus is unaffected (max bucket ≈ 2
    at sf0.01/sf0.1); the planted hot-bucket test in tests/test_dedup.py
    pins that an over-cap pile-up emits zero pairs from that bucket while
    normal pairs survive. Pure-Python oracle (same cap) in
    tests/test_dedup.py.

    Sketching (shingle → signatures → band buckets) lives in the shared
    core ``operators/incremental_dedup.py:minhash_bands`` — the same
    definition powers the incremental index, so batch and incremental can
    never drift."""
    from pyspark import StorageLevel

    from ..operators.incremental_dedup import minhash_bands

    # the band frame feeds the hot-bucket census AND both self-join sides;
    # left lazy each consumer re-runs the shingle->md5->min sketch pass
    # (4 corpus scans measured r06) — persist the O(docs x 4 bands) frame,
    # the same materialized-sketch discipline as minhash_jaccard_estimates
    banded = minhash_bands(
        _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    return _lsh_candidate_pairs(banded, bucket_cap)


def _lsh_candidate_pairs(banded, bucket_cap: int):
    """(band, bucket, doc_id) rows -> distinct (doc_a < doc_b) candidate
    pairs from under-cap buckets. Shared by ``minhash_lsh_candidates``
    and the signature-Jaccard estimator so the capping discipline is one
    definition."""
    too_big = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
    )
    capped = banded.join(
        F.broadcast(too_big.select("band", "bucket")), ["band", "bucket"], "left_anti"
    )
    a = capped.alias("a")
    b_ = capped.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


_SIMHASH_BITS = 60  # md5_long is 60-bit (functions/hashing.py)
_SIMHASH_BAND_BITS = _SIMHASH_BITS // 4


def _simhash_fp_duck(corpus_sql: str) -> str:
    """DuckDB CTE chain ending in fp(doc_id, simhash) — the oracle twin of
    simhash_fingerprints_of over an arbitrary corpus SELECT."""
    votes = ",\n             ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(_SIMHASH_BITS)
    )
    pack = "\n           + ".join(
        f"CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for i in range(_SIMHASH_BITS)
    )
    return rf"""
    corpus AS ({corpus_sql}),
    toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      FROM corpus
    ),
    h AS (SELECT doc_id, {md5_long_duck('tok')} AS h FROM toks),
    votes AS (SELECT doc_id, {votes}
              FROM h GROUP BY doc_id),
    fp AS (SELECT doc_id, {pack} AS simhash FROM votes)
    """


@register(
    "simhash_fingerprints",
    f"WITH {_simhash_fp_duck('SELECT doc_id, text FROM documents')}"
    "SELECT doc_id, simhash FROM fp",
)
def simhash_fingerprints(spark, sf_dir):
    """SimHash document fingerprints: per-token 60-bit cross-engine hash
    (md5_long, functions/hashing.py) → 60 signed bit votes → sign
    aggregation → packed fingerprint, entirely with built-in expressions
    (explode + bitwise ops; no Python). Near-dup = small Hamming distance
    (bit_count(a ^ b)) — pair generation at scale is
    `simhash_neardup_pairs` (banded Hamming join). Full DuckDB value
    oracle (same hash, same votes); pure-Python twin in test_dedup.py."""
    return simhash_fingerprints_of(
        _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    )


_SIMHASH_PAIRS_ORACLE = f"""
    WITH {_simhash_fp_duck(_DUP_UNION_DUCK)},
    banded AS (
      SELECT doc_id, simhash, band,
             (simhash >> ({_SIMHASH_BAND_BITS} * band)) & {(1 << _SIMHASH_BAND_BITS) - 1}
               AS bucket
      FROM fp CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)
    ),
    ok AS (
      SELECT band, bucket FROM banded GROUP BY band, bucket
      HAVING count(*) <= 64
    ),
    capped AS (SELECT b.* FROM banded b JOIN ok USING (band, bucket))
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
    FROM capped a JOIN capped b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


@register("simhash_neardup_pairs", _SIMHASH_PAIRS_ORACLE)
def simhash_neardup_pairs(spark, sf_dir, hamming_max: int = 3, bucket_cap: int = 64):
    """SimHash near-dup PAIRS — the Manku/Jain/Sarma (WWW'07) web-dedup
    shape Google ran at crawl scale: split each 60-bit fingerprint into 4
    15-bit bands; by pigeonhole, any pair within Hamming distance
    ``hamming_max`` ≤ 3 shares at least one band verbatim, so an exact
    band-bucket self-join finds ALL such pairs without comparing every
    pair; the exact popcount check then filters candidates.

    Input: the dup-union corpus (documents + doc_id<50 re-crawled under
    +10000, same as exact_dedup) so the query has guaranteed work —
    re-crawls hash to Hamming 0.  Scale shape: shuffle key = (band,
    16-bit band value) — constant width; hot band buckets (a common
    prefix/suffix pattern across boilerplate docs) are dropped via the
    same broadcast anti-join cap as the MinHash path, keeping the
    self-join sub-quadratic.  All JVM expressions (shifts, xor,
    bit_count) — no Python.  Full DuckDB value oracle (same 60-bit
    md5_long hash, banding + cap); pure-Python twin in
    tests/test_dedup.py."""
    from pyspark import StorageLevel

    # the voted-fingerprint aggregation is the expensive stage (token
    # explode + md5 + 60 conditional sums); its four consumers (hot-bucket
    # census + both self-join sides, each twice through the cap's anti
    # join) would re-run it 4x through lineage fan-out (measured r06:
    # 8 corpus scans) — persist the O(docs)x2-column frame instead, the
    # materialized fingerprint-table step of a production simhash dedup
    fps = simhash_fingerprints_of(
        _spread(_dup_union(spark, sf_dir), "doc_id")
    ).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftrightunsigned(F.col("simhash"), _SIMHASH_BAND_BITS * b)
            .bitwiseAND(F.lit((1 << _SIMHASH_BAND_BITS) - 1))
            .alias("bucket"),
        )
        for b in range(4)
    ]
    banded = fps.select(
        "doc_id", "simhash", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    too_big = (
        banded.groupBy("band", "bucket")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
    )
    capped = banded.join(
        F.broadcast(too_big.select("band", "bucket")), ["band", "bucket"], "left_anti"
    )
    a, b_ = capped.alias("a"), capped.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .where(ham <= hamming_max)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.cast("long").alias("hamming"),
        )
        .distinct()
    )


def simhash_fingerprints_of(docs):
    """(doc_id, text) -> (doc_id, simhash): the simhash_fingerprints body
    over an arbitrary frame (shared by the catalog query and the pair
    generator). 60 voted bits — md5_long's width; bits 60-63 are always 0
    in every engine, so the fingerprint is cross-engine exact."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    h = toks.select("doc_id", md5_long(F.col("tok")).alias("h"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(_bit(i))) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(_SIMHASH_BITS)
        ]
    )
    fp = None
    for i in range(_SIMHASH_BITS):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(_bit(i))).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return votes.select("doc_id", fp.alias("simhash"))


# ===========================================================================
# Similarity search (embeddings)
# ===========================================================================

_COS_DUCK = """
    WITH q AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id, embedding::DOUBLE[] e FROM embeddings)
    SELECT query_id, vec_id, cosine FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
             round(list_dot_product(q.e, c.e)
                   / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6)
               AS cosine,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_dot_product(q.e, c.e)
                        / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e)))
                        DESC, c.vec_id) AS rn
      FROM q JOIN c ON q.vec_id <> c.vec_id
    ) WHERE rn <= 5
"""


@register("ann_cosine_topk", _COS_DUCK)
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k (the exact baseline for ANN): broadcast the
    query vectors against the corpus, dot products via zip_with/aggregate in
    double precision (deterministic left-to-right fold — bit-identical to
    the oracle), per-query top-k via window. The scale path is
    ann_lsh_topk (bucketed)."""
    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        ),
        "vec_id",
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    joined = emb.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    cos = dot(F.col("qe"), F.col("e")) / (
        F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("e"), F.col("e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        joined.select("query_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )


_ANN_DIM = 64  # the embeddings tables ship dim-64 vectors at every SF


def _hyperplane(p: int, dim: int = _ANN_DIM) -> list[float]:
    """Deterministic pseudo-hyperplane p: per-dim components in [-0.5, 0.5)
    derived from the cross-engine md5_long hash — computed ONCE driver-side
    (hashlib) and embedded as literals in both the Spark plan and the
    DuckDB oracle, so both engines run dot products against bit-identical
    constants."""
    from ..functions.hashing import md5_long_py

    return [md5_long_py(f"hp:{p}:{i}") % 1000 / 1000.0 - 0.5 for i in range(dim)]


def _ann_lsh_oracle_sql(bands: int = 8, bits: int = 8, k: int = 5) -> str:
    def bucket_expr(b: int) -> str:
        parts = []
        for r in range(bits):
            plane = ", ".join(repr(c) for c in _hyperplane(b * bits + r))
            parts.append(
                f"CASE WHEN list_dot_product(e, [{plane}]) > 0"
                f" THEN CAST({1 << r} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
            )
        return "\n           + ".join(parts)

    band_cases = "\n        ".join(
        f"WHEN {b} THEN {bucket_expr(b)}" for b in range(bands)
    )
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    banded AS (
      SELECT vec_id, e, band,
             CASE band
        {band_cases}
             END AS bucket
      FROM e CROSS JOIN (SELECT unnest(range(0, {bands})) AS band)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS query_id, b.vec_id AS vid
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id <> b.vec_id
    ),
    j AS (
      SELECT c.query_id, c.vid, qa.e AS qe, ca.e AS ce
      FROM cand c JOIN e qa ON qa.vec_id = c.query_id
                  JOIN e ca ON ca.vec_id = c.vid
    )
    SELECT query_id, vid AS vec_id, cosine FROM (
      SELECT query_id, vid,
             round(list_dot_product(qe, ce)
                   / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))), 6)
               AS cosine,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY list_dot_product(qe, ce)
                        / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce)))
                        DESC, vid) AS rn
      FROM j
    ) WHERE rn <= {k}
    """


@register("ann_lsh_topk", _ann_lsh_oracle_sql())
def ann_lsh_topk(spark, sf_dir, bands: int = 8, bits: int = 8, k: int = 5):
    """Scale-path ANN: MULTI-BAND random-hyperplane LSH (the minhash banding
    shape). Each vector gets `bands` independent sign-bit buckets, `bits`
    deterministic pseudo-hyperplanes each (md5-derived literal constants —
    the SAME constants are embedded in the DuckDB oracle, giving this a
    full driver value oracle); candidates = pairs sharing ANY band's bucket
    (union), deduped, then exact cosine re-ranks the candidate set.
    Per-vector output is `bands` constant-width rows, so the shuffle never
    carries O(corpus) state; at larger corpora `bits` grows
    ~log2(N/target_bucket_size) to keep in-bucket pair counts bounded, and
    `bands` buys recall back. Recall@5 >= 0.8 vs the brute-force baseline
    is asserted on a genuinely clustered corpus in tests/test_similarity.py
    (the driver's synthetic embeddings are isotropic-random — no LSH family
    can recover near-orthogonal "neighbors" there without scanning
    ~everything; the same test pins the measured recall floor on that
    corpus too)."""
    from pyspark import StorageLevel

    emb = _spread(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
        ),
        "vec_id",
    )

    # hyperplane constants precomputed driver-side (O(bands·bits·dim)
    # literals — plan metadata, not data) and folded against each vector
    def plane_dot(p):
        comps = _hyperplane(p)
        return F.aggregate(
            F.zip_with(
                F.col("e"),
                F.array(*[F.lit(c) for c in comps]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def band_bucket(b):
        bucket = None
        for r in range(bits):
            p = b * bits + r
            bit = F.when(plane_dot(p) > 0, F.lit(_bit(r))).otherwise(
                F.lit(0).cast("long")
            )
            bucket = bit if bucket is None else bucket.bitwiseOR(bit)
        return F.struct(F.lit(b).alias("band"), bucket.alias("bucket"))

    # persisted (r07): the self-join consumes banded on BOTH sides, and a
    # lazy frame re-runs the bands x bits interpreted hyperplane folds —
    # the query's dominant cost — once per side; the cache is bounded at
    # bands x |vectors| rows
    banded = emb.select(
        "vec_id",
        "e",
        F.explode(F.array(*[band_bucket(b) for b in range(bands)])).alias("bb"),
    ).select(
        "vec_id", "e", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    ).persist(StorageLevel.MEMORY_AND_DISK)

    a = banded.alias("a")
    b_ = banded.alias("b")
    # union candidates across bands: one groupBy dedups pairs AND carries the
    # vectors (first() is exact: every band row holds the same array), so the
    # re-rank needs no second pass over the corpus.
    cand = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("query_id"), F.col("b.vec_id").alias("vec_id")
        )
        .agg(F.first(F.col("a.e")).alias("qe"), F.first(F.col("b.e")).alias("ce"))
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, z: acc + z
        )

    cos = dot(F.col("qe"), F.col("ce")) / (
        F.sqrt(dot(F.col("qe"), F.col("qe"))) * F.sqrt(dot(F.col("ce"), F.col("ce")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        cand.select("query_id", "vec_id", cos.alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )


# ===========================================================================
# Crawl analogs on oracle-checkable tables (frontier pop / seen anti-join)
# ===========================================================================

@register(
    "frontier_pop_topk",
    """
    WITH frontier AS (
      SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host,
             'https://h' || CAST(user_id % 50 AS VARCHAR) || '/e' || CAST(event_id AS VARCHAR) AS url,
             value AS priority, ts, event_id
      FROM events
    )
    SELECT host, url, priority FROM (
      SELECT host, url, priority,
             row_number() OVER (PARTITION BY host
                                ORDER BY priority DESC, ts, url) AS rn
      FROM frontier
    ) WHERE rn <= 4
    """,
)
def frontier_pop_topk(spark, sf_dir):
    """W5 — THE frontier pop: per-host windowed top-k under a politeness
    budget (4/host/round) with the engine's canonical total order
    (priority DESC, ts, url) — SURVEY.md §1.4-4. Synthesized from events so
    the DuckDB oracle can check it."""
    e = _spread(
        _t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts"),
        "event_id",
    )
    host = F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string"))
    url = F.concat(F.lit("https://"), host, F.lit("/e"), F.col("event_id").cast("string"))
    frontier = e.select(
        host.alias("host"), url.alias("url"), F.col("value").alias("priority"), "ts"
    )
    w = Window.partitionBy("host").orderBy(F.desc("priority"), "ts", "url")
    return (
        frontier.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 4)
        .select("host", "url", "priority")
    )


@register(
    "seen_anti_join",
    """
    WITH seen AS (SELECT event_id FROM events WHERE event_id % 3 = 0),
    candidates AS (SELECT event_id, user_id FROM events WHERE event_type = 'click')
    SELECT c.event_id AS event_id, c.user_id AS user_id
    FROM candidates c
    WHERE NOT EXISTS (SELECT 1 FROM seen s WHERE s.event_id = c.event_id)
    """,
)
def seen_anti_join(spark, sf_dir):
    """J6/U4 — URL-seen dedup as exact LEFT ANTI JOIN (the settle step after
    the bloom prefilter; the bloom itself is engine-internal, tested in
    test_crawl.py with a zero-false-negative property test)."""
    e = _t(spark, sf_dir, "events")
    seen = e.where(F.col("event_id") % 3 == 0).select("event_id")
    cand = e.where(F.col("event_type") == "click").select("event_id", "user_id")
    return cand.join(seen, "event_id", "left_anti")


@register(
    "url_canonicalization",
    """
    SELECT url, lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]+)', 1)) AS host
    FROM (
      SELECT 'https://H' || CAST(user_id % 50 AS VARCHAR) || '.Example.COM/Path'
             || CAST(event_id AS VARCHAR) AS url
      FROM events WHERE event_type = 'signup'
    )
    """,
)
def url_canonicalization(spark, sf_dir):
    """F16 — host extraction + lowercasing as pure Column exprs (the full
    canonicalizer incl. fragment/port/slash rules is property-tested in
    test_crawl.py; this checks the hot-path host rule cross-engine)."""
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "signup")
    url = F.concat(
        F.lit("https://H"),
        (F.col("user_id") % 50).cast("string"),
        F.lit(".Example.COM/Path"),
        F.col("event_id").cast("string"),
    )
    d = e.select(url.alias("url"))
    return d.select(
        "url",
        F.lower(F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]+)", 1)).alias("host"),
    )


def _langid_oracle_sql() -> str:
    """DuckDB twin of functions.text.detect_language: marker-substring
    counts via (len - len(replace))/len(marker) — the same non-overlapping
    left-to-right semantics as Python str.count — argmax with
    first-in-dict-order tie-breaking ('und' when all scores are 0)."""
    from ..functions.text import _LANG_MARKERS

    def score(markers):
        return " + ".join(
            f"(length(s) - length(replace(s, '{m}', ''))) // {len(m)}"
            for m in markers
        )

    langs = list(_LANG_MARKERS)  # dict order == the Python scan order
    scores = ", ".join(
        f"({score(ms)}) AS s_{l}" for l, ms in _LANG_MARKERS.items()
    )
    # first language (in scan order) achieving the max wins; all-zero -> und
    branches = [
        "WHEN " + " AND ".join(f"s_{l} = 0" for l in langs) + " THEN 'und'"
    ]
    for i, l in enumerate(langs):
        rest = langs[i + 1 :]
        if rest:
            cond = " AND ".join(f"s_{l} >= s_{r}" for r in rest)
            branches.append(f"WHEN {cond} THEN '{l}'")
        else:
            branches.append(f"ELSE '{l}'")
    case = "CASE " + " ".join(branches) + " END"
    return f"""
    WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS s FROM documents),
    sc AS (SELECT doc_id, lang, {scores} FROM p)
    SELECT doc_id, lang, {case} AS lang_detected FROM sc
    """


@register("langid_heuristic", _langid_oracle_sql())
def langid_heuristic(spark, sf_dir):
    """Language-ID n-gram heuristic over documents (engine addition). The
    Arrow UDF really scans marker substrings per row (functions/text.py:83);
    the DuckDB oracle recomputes the same scores with replace-count algebra —
    a drift in either side is a hash mismatch. Accuracy on a labeled
    marker-bearing corpus is asserted in tests/test_text_ops.py (the
    driver's synthetic documents text does not correlate with its lang
    column, so corpus accuracy is not a meaningful target)."""
    from ..functions.udfs import detect_language_udf

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", detect_language_udf(F.col("text")).alias("lang_detected"))


_PREFIX8_DUCK = r"array_to_string((regexp_split_to_array(trim(text), '\s+'))[1:8], ' ')"


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           {md5_long_duck('text')} AS fp64,
           {md5_long_duck(_PREFIX8_DUCK)} AS prefix_fp
    FROM documents
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: stable 60-bit content ids (md5-derived,
    functions/hashing.py — bit-identical in Spark, DuckDB, and Python, so
    this carries a full value oracle) + first-8-token prefix hash for
    rolling/near-prefix grouping. Shuffle-free codegen projection.
    xxhash64 remains the marginally cheaper JVM-only alternative where
    cross-engine verification isn't needed; the plan shape is identical."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        md5_long(F.col("text")).alias("fp64"),
        md5_long(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("prefix_fp"),
    )


_RK_MOD = 1000000007  # Rabin-Karp modulus; acc*257+c stays < 2^63 in both engines

# Shared DuckDB CTE chain computing per-doc rolling 3-token-window hashes
# (the oracle twin of rolling_window_hashes below) — ends with h(doc_id, hashes).
_RK_HASHES_DUCK = r"""
    t AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents
    ),
    w AS (
      SELECT doc_id, list_transform(range(1, greatest(len(toks)-2, 1)+1),
               i -> array_to_string(toks[i:i+2], ' ')) AS wins
      FROM t
    ),
    h AS (
      SELECT doc_id, list_transform(wins, s ->
          list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, length(s)+1), j -> CAST(ascii(substr(s, j, 1)) AS BIGINT))),
            (a, c) -> (a*257 + c) % 1000000007)) AS hashes
      FROM w
    )
"""


def rolling_window_hashes(text: F.Column) -> F.Column:
    """Per-row array of Rabin–Karp hashes of every 3-token window of the
    whitespace-normalized, lowercased text (codegen regexp construction via
    word_windows; <3-token rows hash one truncated window).  Shared by
    doc_fingerprints_rolling and neardup_clusters; the DuckDB twin is
    _RK_HASHES_DUCK."""
    norm = ws_normalize(F.lower(text))
    toks = F.split(norm, " ")
    wins = F.when(F.size(toks) < 3, F.array(norm)).otherwise(word_windows(norm, 3))

    def _rk(s):
        codes = F.transform(F.split(s, ""), lambda c: F.ascii(c).cast("long"))
        return F.aggregate(
            codes, F.lit(0).cast("long"), lambda a, c: (a * 257 + c) % _RK_MOD
        )

    return F.transform(wins, _rk)


@register(
    "doc_fingerprints_rolling",
    f"""
    WITH {_RK_HASHES_DUCK}
    SELECT doc_id, len(hashes) AS n_windows,
           list_aggregate(hashes, 'min') AS min_fp,
           len(list_distinct(hashes)) AS distinct_fps
    FROM h
    """,
)
def doc_fingerprints_rolling(spark, sf_dir):
    """Document fingerprinting via a rolling (Rabin–Karp) hash — the classic
    winnowing shape (Schleimer et al., MOSS): slide a 3-token window over the
    document, polynomial-hash each window (fold acc*257+code mod 1e9+7 over
    characters), and keep per-doc sketch stats: window count, the minimum
    window hash (a 1-permutation minhash — equal min_fp groups are near-dup
    candidates), and the distinct-hash count (internal repetition signal).

    A pure shuffle-free projection (the window construction is a codegen
    regexp pass — measured 3.7x faster than a transform/slice chain; the
    per-window character fold is an interpreted higher-order aggregate),
    so it scales linearly with input bytes at any cluster size.
    Complements `doc_fingerprints` (xxhash64 content ids): that one is the
    fast JVM-native path for exact ids; this one is the reference rolling
    semantics with a cross-engine DuckDB oracle (same fold, list_reduce).

    Edge semantics pinned in tests/test_text_ops.py: <3-token docs hash one
    truncated window (mirrors functions.text.shingles); empty text hashes
    to 0 in both engines.
    """
    d = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    hashes = rolling_window_hashes(F.col("text"))
    return d.select(
        "doc_id",
        F.size(hashes).alias("n_windows"),
        F.array_min(hashes).alias("min_fp"),
        F.size(F.array_distinct(hashes)).alias("distinct_fps"),
    )


@register(
    "neardup_clusters",
    f"""
    WITH RECURSIVE
    {_RK_HASHES_DUCK},
    sk0 AS (SELECT doc_id, unnest(list_sort(list_distinct(hashes))[1:2]) AS hh FROM h),
    sk AS (
      SELECT doc_id, hh FROM sk0
      WHERE hh IN (SELECT hh FROM sk0 GROUP BY hh HAVING count(*) <= 16)
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
      FROM sk a JOIN sk b ON a.hh = b.hh AND a.doc_id < b.doc_id
    ),
    bidir AS (SELECT ea, eb FROM edges UNION SELECT eb AS ea, ea AS eb FROM edges),
    reach(ra, rb) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.ra, e.eb FROM reach r JOIN bidir e ON r.rb = e.ea
    )
    SELECT ra AS doc_id, min(rb) AS component FROM reach GROUP BY ra
    """,
)
def neardup_clusters(spark, sf_dir):
    """Near-dup clustering: candidate pairs → connected components → one
    cluster id per document (the step after candidate generation in every
    dedup pipeline — each component keeps one representative).

    Candidates here come from a 2-smallest-rolling-hash sketch (two
    1-perm minhashes per doc): docs sharing either sketch hash get an
    edge, so documents BRIDGE buckets and components are genuinely
    multi-hop (87 nontrivial clusters at sf0.01).  Components run through
    operators/graph.connected_components — iterative min-label
    propagation, every step a shuffle-on-node-id join, lineage truncated
    per round; at 10^10 docs neither edges nor labels ever touch the
    driver.  The DuckDB twin computes the same components with a
    recursive transitive-closure CTE — tractable at gate scale, and an
    entirely independent algorithm (closure vs propagation), so agreement
    pins the semantics, not the implementation.
    """
    return neardup_components(_t(spark, sf_dir, "documents"))


def neardup_components(docs, bucket_cap: int = 16):
    """Reusable near-dup clustering core over any (doc_id, text) frame:
    2-smallest-rolling-hash sketch → capped bucket join → distinct edges →
    distributed connected components → (doc_id, component) with singletons
    labeled by their own id.  Shared by the `neardup_clusters` catalog query
    and the composed training pipeline (plans/training.py)."""
    from ..operators.graph import connected_components

    hashes = rolling_window_hashes(F.col("text"))
    sketch = F.slice(F.array_sort(F.array_distinct(hashes)), 1, 2)
    sk0 = docs.select("doc_id", F.explode(sketch).alias("h"))
    # bucket-size cap: a degenerate ultra-common sketch hash (boilerplate,
    # empty docs) would otherwise produce a quadratic edge bucket at web
    # scale; real dedup pipelines skip too-common buckets. Cap chosen so
    # the gate corpus is unaffected (max bucket ~4 at sf0.01).
    too_big = (
        sk0.groupBy("h")
        .agg(F.count("*").alias("bsz"))
        .where(F.col("bsz") > bucket_cap)
    )
    # the over-cap hash set is tiny by construction (few ultra-common
    # hashes exist) — broadcast ANTI join, never a broadcast of the
    # (corpus-sized) small-bucket side
    sk = sk0.join(F.broadcast(too_big.select("h")), "h", "left_anti")
    a, b = sk.alias("a"), sk.alias("b")
    edges = (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a"), F.col("b.doc_id").alias("b"))
        .distinct()
    )
    comp = connected_components(edges)
    alld = docs.select("doc_id")
    return alld.join(comp, alld["doc_id"] == comp["node"], "left").select(
        "doc_id", F.coalesce("component", "doc_id").alias("component")
    )


@register(
    "neardup_survivors_count",
    f"""
    WITH RECURSIVE
    {_RK_HASHES_DUCK},
    sk0 AS (SELECT doc_id, unnest(list_sort(list_distinct(hashes))[1:2]) AS hh FROM h),
    sk AS (
      SELECT doc_id, hh FROM sk0
      WHERE hh IN (SELECT hh FROM sk0 GROUP BY hh HAVING count(*) <= 16)
    ),
    edges AS (
      SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
      FROM sk a JOIN sk b ON a.hh = b.hh AND a.doc_id < b.doc_id
    ),
    bidir AS (SELECT ea, eb FROM edges UNION SELECT eb AS ea, ea AS eb FROM edges),
    reach(ra, rb) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.ra, e.eb FROM reach r JOIN bidir e ON r.rb = e.ea
    ),
    comp AS (SELECT ra AS doc_id, min(rb) AS component FROM reach GROUP BY ra)
    SELECT count(*) AS n_docs,
           count(*) FILTER (WHERE doc_id = component) AS n_survivors
    FROM comp
    """,
)
def neardup_survivors_count(spark, sf_dir):
    """The dedup payoff of `neardup_clusters`: keep one representative per
    component (the minimum doc_id — deterministic, join-free: a doc
    survives iff it IS its component id) and report corpus size before and
    after.  Same clustering lineage; the keeper rule costs one predicate,
    no extra shuffle."""
    comp = neardup_clusters(spark, sf_dir)
    return comp.agg(
        F.count("*").alias("n_docs"),
        F.count(F.when(F.col("doc_id") == F.col("component"), 1)).alias(
            "n_survivors"
        ),
    )


_BOILER = "Subscribe to our newsletter for updates"


@register(
    "paragraph_dedup",
    rf"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0 THEN '{_BOILER}. ' || text ELSE text END AS t
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(t, '\.\s+')) AS para,
             generate_subscripts(regexp_split_to_array(t, '\.\s+'), 1) AS pos
      FROM aug
    ),
    r AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
      FROM p
    )
    SELECT doc_id, count(*) AS n_paras,
           count(*) FILTER (WHERE rn = 1) AS n_kept,
           md5(coalesce(string_agg(para, '. ' ORDER BY pos)
                          FILTER (WHERE rn = 1), '')) AS kept_md5
    FROM r GROUP BY doc_id
    """,
)
def paragraph_dedup(spark, sf_dir):
    """Exact PARAGRAPH dedup (C4/Dolma boilerplate removal): split each
    document into sentence/paragraph units, keep only the globally FIRST
    occurrence of each unit (min (doc_id, pos) per md5(paragraph)), and
    report per-doc unit counts plus an md5 of the reconstructed kept text.
    The driver's synthetic corpus has no shared boilerplate, so a
    deterministic in-query augmentation (doc_id % 5 == 0 gets a shared
    boilerplate sentence prepended) gives the dedup real work on both
    engines — the boilerplate survives only in the smallest doc_id.

    Scale shape: the shuffle key is md5(paragraph) (fixed width, uniform —
    never the document body); first-occurrence is a min(struct(doc_id,
    pos)) CENSUS per hash joined back to the persisted unit table (r07:
    it was a row_number window PARTITION BY the hash — but a boilerplate
    paragraph shared by millions of documents is exactly the hot key
    this query exists to remove, and a window partition cannot be split,
    while the census partial-aggregates map-side and AQE skew-splits the
    join); reconstruction is a per-doc groupBy with a sorted collect of
    the kept units (bounded by document size, not corpus size).  Linear
    at any corpus scale — the same plan C4 ran over Common Crawl.
    """
    from pyspark import StorageLevel

    d = _t(spark, sf_dir, "documents")
    aug = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(F.lit(_BOILER + ". "), F.col("text")),
    ).otherwise(F.col("text"))
    paras = d.select(
        "doc_id",
        F.posexplode(F.split(aug, r"\.\s+")).alias("pos", "para"),
    ).withColumn("h", F.md5("para")).persist(StorageLevel.MEMORY_AND_DISK)
    keeper = paras.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    r = paras.join(keeper, "h").withColumn(
        "is_first", F.col("k") == F.struct("doc_id", "pos")
    )
    kept_struct = F.when(F.col("is_first"), F.struct("pos", "para"))
    return r.groupBy("doc_id").agg(
        F.count("*").alias("n_paras"),
        F.count(F.when(F.col("is_first"), 1)).alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda x: x["para"]
                ),
                ". ",
            )
        ).alias("kept_md5"),
    )


def ivf_kmeans_centroids(spark, emb, k_cells: int = 10, max_iters: int = 8):
    """Distributed k-means trained to (near-)convergence — Lloyd iterations
    with deterministic, order-independent arithmetic throughout:

    1. init: the k vectors with the smallest xxhash64(vec_id) (deterministic,
       no RNG state; a global sort-limit-k — O(k) driver state).
    2. per iteration, one assignment + partial-aggregation pass via
       mapInPandas: each Arrow batch assigns its vectors to the nearest
       current centroid (argmax cosine, one BLAS matmul) and emits per-cell
       (count, Σ micro-quantized components). Integer micro-sums
       (round(x*1e6)) make the reduction ORDER-INDEPENDENT and bit-exact —
       float summation order across batches/shuffles can't perturb the
       centroids, so the iteration trajectory is reproducible on any
       partitioning (and replicated exactly by the numpy twin in
       tests/test_similarity.py).
    3. driver reduce: k rows of (cell, cnt, Σmicro) -> centroid[d] =
       Σmicro / (cnt * 1e6). O(k*dim) driver control state per iteration.
    4. stop when the integer state (per-cell counts + micro-sums) repeats —
       assignments under the new centroids equal the previous pass, i.e.
       Lloyd has converged — or after ``max_iters`` (k-means can cycle on
       ties; the integer state makes the equality test exact, not an
       epsilon). Empty cells drop out and indices re-compact each round.

    The input is persisted for the duration of the loop (each iteration is
    one scan; at 100 TB this is the standard cache-for-iterations trade —
    MEMORY_AND_DISK so executors spill rather than recompute lineage).

    Returns {cell_index: [float centroid]} for non-empty cells.
    """
    import numpy as np
    import pandas as pd
    from pyspark import StorageLevel
    from pyspark.sql import types as T

    seeds = (
        emb.select("vec_id", "e")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(k_cells)
        .collect()
    )
    C = np.array([list(r["e"]) for r in seeds], dtype=np.float64)
    dim = C.shape[1]

    schema = T.StructType(
        [
            T.StructField("cell", T.IntegerType()),
            T.StructField("cnt", T.LongType()),
            T.StructField("s", T.ArrayType(T.LongType())),
        ]
    )

    vecs = emb.select("e").persist(StorageLevel.MEMORY_AND_DISK)
    prev_state = None
    try:
        for _ in range(max_iters):
            C_unit = C / np.linalg.norm(C, axis=1, keepdims=True)

            def partials(batches, C_unit=C_unit):
                for pdf in batches:
                    X = np.array([list(v) for v in pdf["e"]], dtype=np.float64)
                    if X.size == 0:
                        continue
                    cells = (X @ C_unit.T).argmax(axis=1)
                    micro = np.rint(X * 1e6).astype(np.int64)
                    rows = []
                    for c in np.unique(cells):
                        m = micro[cells == c]
                        rows.append((int(c), int(m.shape[0]), m.sum(axis=0).tolist()))
                    yield pd.DataFrame(rows, columns=["cell", "cnt", "s"])

            agg = (
                vecs.mapInPandas(partials, schema=schema)
                .select("cell", "cnt", F.posexplode("s").alias("pos", "v"))
                .groupBy("cell", "pos")
                .agg(F.sum("cnt").alias("cnt"), F.sum("v").alias("sv"))
                .collect()
            )
            cnts: dict[int, int] = {}
            sums: dict[int, list[int]] = {}
            for r in agg:
                sums.setdefault(r["cell"], [0] * dim)[r["pos"]] = r["sv"]
                cnts[r["cell"]] = r["cnt"]
            state = {c: (cnts[c], tuple(sums[c])) for c in cnts}
            C = np.array(
                [
                    [sums[c][d] / (cnts[c] * 1e6) for d in range(dim)]
                    for c in sorted(cnts)
                ]
            )
            if state == prev_state:  # fixed point: exact integer equality
                break
            prev_state = state
    finally:
        vecs.unpersist()
    return {i: C[i].tolist() for i in range(C.shape[0])}


@register("ann_ivf_topk", None)  # engine-defined cells: no SQL twin
def ann_ivf_topk(spark, sf_dir, k_cells: int = 10, nprobe: int = 2, k: int = 5):
    """Scale-path ANN #2: IVF (inverted-file) search over LEARNED cells —
    one deterministic k-means-lite pass (ivf_kmeans_centroids: xxhash64
    seed-pick, mapInPandas assignment + exact integer partial sums). Each
    vector is assigned to its nearest learned centroid; each query probes
    the nprobe nearest cells by centroid cosine; exact re-rank runs inside
    the probed cells only — the candidate set is bounded by cell sizes,
    never O(corpus). Exact-within-probed-cells + recall vs brute force are
    asserted in tests/test_similarity.py against a numpy twin of the whole
    pipeline."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    centroids = ivf_kmeans_centroids(spark, emb, k_cells)
    C = np.array([centroids[c] for c in sorted(centroids)], dtype=np.float64)
    cell_ids = sorted(centroids)
    C_unit = C / np.linalg.norm(C, axis=1, keepdims=True)

    assign_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            X = np.array([list(v) for v in pdf["e"]], dtype=np.float64)
            if X.size == 0:
                continue
            idx = (X @ C_unit.T).argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "cell": [cell_ids[i] for i in idx]}
            )

    assigned = emb.select("vec_id", "e").mapInPandas(assign, schema=assign_schema)
    cells_df = F.broadcast(
        spark.createDataFrame(
            [(c, centroids[c]) for c in cell_ids],
            T.StructType(
                [
                    T.StructField("cell", T.IntegerType()),
                    T.StructField("centroid", T.ArrayType(T.DoubleType())),
                ]
            ),
        )
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    def cos(a, b):
        return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    w_cell = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), "cell")
    probed = (
        q.crossJoin(cells_df)
        .withColumn("cell_cos", cos(F.col("qe"), F.col("centroid")))
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qe", "cell")
    )
    # exact re-rank inside probed cells only
    cand = (
        emb.join(assigned, "vec_id")
        .join(F.broadcast(probed), "cell")
        .where(F.col("query_id") != F.col("vec_id"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        cand.select("query_id", "vec_id", cos(F.col("qe"), F.col("e")).alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )


# ===========================================================================
# Exact substring (rolling W-gram) dedup — Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better" (ExactSubstr). The reference
# corpus pipeline (crawl_articles.py -> compute_statistics) has no dedup at
# all; this is the canonical training-data operation layered on top. The
# paper builds a suffix array over the whole corpus on one machine; the
# distributed re-expression is the bounded-window form every Spark-scale
# pipeline uses (fixed W-token windows, global first-occurrence keeps the
# span) — same duplicated-span semantics for spans >= W, shuffle keys are
# 8-byte xxhash64 window hashes, never document text.
# ===========================================================================

_SUBSTR_W = 15

_SUBSTR_WINS_SQL = rf"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
    ), wins AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - {_SUBSTR_W - 1}),
                                   i -> {{'pos': i,
                                          'g': array_to_string(t[i:i+{_SUBSTR_W - 1}], ' ')}}),
                    recursive := true)
      FROM toks WHERE len(t) >= {_SUBSTR_W}
    ), flagged AS (
      SELECT doc_id, pos,
             row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) > 1 AS dup
      FROM wins
    )
"""


@register(
    "substring_dup_stats",
    _SUBSTR_WINS_SQL
    + """
    SELECT doc_id,
           count(*) AS n_windows,
           count(*) FILTER (WHERE dup) AS dup_windows,
           round(count(*) FILTER (WHERE dup) / CAST(count(*) AS DOUBLE), 6)
             AS dup_ratio
    FROM flagged GROUP BY doc_id
    """,
)
def substring_dup_stats(spark, sf_dir, w: int = _SUBSTR_W):
    """Per-document duplicated-substring statistics: every overlapping
    W-token window is hashed; a window occurrence is DUPLICATED unless it
    is the globally first occurrence of that window text (min (doc_id,
    pos) order — the ExactSubstr keeper rule). Docs shorter than W tokens
    have no windows and no row (same WHERE in the oracle).

    Scale shape — why this is NOT a window-function plan: a boilerplate
    W-gram shared by millions of docs would funnel its every occurrence
    through one row_number() partition. Instead: (1) partial-aggregate
    occurrences to one row per (window-hash, doc) with a count and the
    doc's min pos — map-side combine eats the within-doc repetition, and
    the table persists (two consumers, one corpus scan); (2) pick the
    global keeper per hash with a min(struct) CENSUS joined back (r07:
    was an unordered window PARTITION BY h — a boilerplate W-gram shared
    by millions of docs is an unsplittable hot window partition, while
    the census partial-aggregates map-side and AQE skew-splits the
    join); (3) re-aggregate per doc. Every shuffle key is the 8-byte
    xxhash64 window hash (a long, narrower to shuffle than a 32-char md5
    string; the oracle keys on raw window text, so the hash
    representation is free) or doc_id; per-occurrence rows are never
    sorted, and the explode is W x token count — linear in corpus bytes,
    the standard trade vs the paper's single-node suffix array.
    """
    from pyspark import StorageLevel

    d = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    wins = d.select(
        "doc_id",
        F.posexplode(word_windows(ws_normalize(F.col("text")), w)).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), F.xxhash64("g").alias("h"))
    per_doc = wins.groupBy("h", "doc_id").agg(
        F.count("*").alias("cnt"), F.min("pos").alias("min_pos")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    keeper = per_doc.groupBy("h").agg(
        F.min(F.struct("doc_id", "min_pos")).alias("k")
    )
    flagged = per_doc.join(keeper, "h").withColumn(
        "dup_cnt",
        F.col("cnt")
        - F.when(
            F.col("k") == F.struct("doc_id", "min_pos"), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    return flagged.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_windows"),
        F.sum("dup_cnt").alias("dup_windows"),
        F.round(F.sum("dup_cnt") / F.sum("cnt").cast("double"), 6).alias("dup_ratio"),
    )


@register(
    "substring_dedup_clean",
    _SUBSTR_WINS_SQL
    + f"""
    , covered AS (
      SELECT DISTINCT doc_id, unnest(generate_series(pos, pos + {_SUBSTR_W - 1})) AS idx
      FROM flagged WHERE dup
    ), cov AS (
      SELECT doc_id, list(idx) AS li FROM covered GROUP BY doc_id
    )
    SELECT t.doc_id,
           length(t.t) AS n_tokens,
           coalesce(length(cov.li), 0) AS n_removed,
           md5(coalesce(array_to_string([t.t[i] FOR i IN generate_series(1, len(t.t))
                                         IF cov.li IS NULL OR NOT list_contains(cov.li, i)],
                                        ' '), '')) AS clean_md5
    FROM toks t LEFT JOIN cov ON t.doc_id = cov.doc_id
    """,
)
def substring_dedup_clean(spark, sf_dir, w: int = _SUBSTR_W):
    """ExactSubstr span REMOVAL: every token covered by any duplicated
    (non-keeper) W-window is dropped; overlapping duplicated spans merge
    by construction (token-index union). Returns per-doc token counts,
    removed-token counts, and an md5 of the rebuilt text (the gate compares
    the full rebuilt string through the hash; the rebuilt text itself stays
    distributed). Docs with no duplicated window — including docs shorter
    than W — pass through with n_removed = 0 and the md5 of their
    whitespace-normalized text.

    Scale shape: occurrence->keeper resolution is an aggregated-side join
    on the 8-byte xxhash64 window hash (no per-occurrence window sort;
    long key, not a 32-char md5 string — the output clean_md5 is what the
    oracle compares, the internal key is free); covered token indices
    explode W rows per duplicated window only; the rebuild is a per-doc
    sorted collect bounded by document length (same discipline as
    paragraph_dedup). All shuffles key on the window hash or doc_id.
    """
    d = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    toks = d.select("doc_id", F.split(ws_normalize(F.col("text")), " ").alias("t"))
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.when(F.size("t") >= w, word_windows(F.array_join(F.col("t"), " "), w))
            .otherwise(F.array().cast("array<string>"))
        ).alias("p0", "g"),
    ).select("doc_id", (F.col("p0") + 1).alias("pos"), F.xxhash64("g").alias("h"))
    keepers = wins.groupBy("h").agg(F.min(F.struct("doc_id", "pos")).alias("k"))
    dup_wins = wins.join(keepers, "h").where(
        F.struct("doc_id", "pos") != F.col("k")
    )
    covered = (
        dup_wins.select(
            "doc_id", F.explode(F.sequence(F.col("pos"), F.col("pos") + w - 1)).alias("idx")
        )
        .distinct()
    )
    tok_rows = toks.select(
        "doc_id", F.size("t").alias("n_tokens"), F.posexplode("t").alias("i0", "tok")
    ).select("doc_id", "n_tokens", (F.col("i0") + 1).alias("idx"), "tok")
    kept = tok_rows.join(covered, ["doc_id", "idx"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.first("n_tokens").alias("n_tokens"),
        F.count("*").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            )
        ).alias("clean_md5"),
    )
    # fully-covered docs vanish from the anti-join: restore them with an
    # empty rebuild (md5('')), keeping the output one row per document
    base = toks.select("doc_id", F.size("t").alias("n_tok_all"))
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tok_all").alias("n_tokens"),
            (F.col("n_tok_all") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce(F.col("clean_md5"), F.md5(F.lit(""))).alias("clean_md5"),
        )
    )


# ===========================================================================
# Semantic dedup — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means
# the embedding space, then prune within-cluster semantic duplicates by
# pairwise cosine. The reference pipeline has no embedding-space dedup at
# all; this is the third member of the engine's dedup ladder (exact ->
# near-textual -> semantic), and the one that catches paraphrases and
# re-writes the text-hash families cannot.
# ===========================================================================


@register("semdedup_prune", None)  # learned cells + engine hash seeds: no SQL twin
def semdedup_prune(spark, sf_dir, k_cells: int = 10, tau: float = 0.7):
    """SemDeDup semantic pruning: cluster embeddings with the engine's
    deterministic k-means (ivf_kmeans_centroids — xxhash64 seed-pick,
    integer-micro Lloyd iterations, exact fixed-point stop), then inside
    each cell mark a vector PRUNED when an earlier-id vector in the same
    cell has cosine >= tau (the deterministic keep-the-smallest-id form of
    the paper's keep-one-per-duplicate-group; the paper keeps the vector
    farthest from the centroid — id order makes the keeper reproducible
    across partitionings and engines). Returns one row per vector:
    (vec_id, cell, pruned, max_prior_cos).

    Scale shape — why this survives 100 TB where naive all-pairs dies:
    the quadratic is confined to a CELL, and cell size is a knob
    (k_cells ~ N / target_cell_size; the paper runs 50k-vector clusters at
    LAION scale). Per cell, applyInPandas sorts by vec_id and computes
    blocked Gram products (4096-row blocks against the earlier prefix) —
    O(block x cell) memory, never O(cell^2) at once, one BLAS matmul per
    block. The only shuffle keys on the int cell id; driver state stays
    O(k x dim) centroids. Bit-exact twin: tests/test_similarity.py
    replicates the identical blocked computation in numpy.
    """
    import numpy as np
    import pandas as pd

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    centroids = ivf_kmeans_centroids(spark, emb, k_cells)
    cell_ids = sorted(centroids)
    C = np.array([centroids[c] for c in cell_ids], dtype=np.float64)
    C_unit = C / np.linalg.norm(C, axis=1, keepdims=True)

    def assign(batches):
        for pdf in batches:
            X = np.array([list(v) for v in pdf["e"]], dtype=np.float64)
            if X.size == 0:
                continue
            idx = (X @ C_unit.T).argmax(axis=1)
            out = pdf[["vec_id", "e"]].copy()
            out["cell"] = [cell_ids[i] for i in idx]
            yield out

    assigned = emb.mapInPandas(assign, schema="vec_id long, e array<double>, cell int")

    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("pruned", T.BooleanType()),
            T.StructField("max_prior_cos", T.DoubleType()),
        ]
    )

    def prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array([list(v) for v in pdf["e"]], dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        n = len(pdf)
        best = np.full(n, -np.inf)
        block = 4096
        for s in range(1, n, block):
            e = min(s + block, n)
            G = Xn[s:e] @ Xn[:e].T  # block rows vs their earlier prefix
            for j in range(s, e):
                best[j] = G[j - s, :j].max()
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "cell": pdf["cell"],
                "pruned": best >= tau,
                "max_prior_cos": [
                    None if np.isinf(b) else round(float(b), 6) for b in best
                ],
            }
        )

    return assigned.groupBy("cell").applyInPandas(prune, schema=out_schema)


# ===========================================================================
# Cardinality sketch (cross-engine HLL)
# ===========================================================================

_HLL_P = 12  # m = 4096 registers: standard error ~1.6%


def _hll_oracle_sql(
    p: int = _HLL_P, include_exact: bool = True, key: str | None = None
) -> str:
    """DuckDB twin of the cross-engine HLL estimate over the lowercased
    whitespace token stream — optionally carrying the exact
    count(DISTINCT) branch (the self-evaluating form) and optionally
    grouped by a documents column ``key`` (the per-group form)."""
    m = 1 << p
    wbits = 60 - p
    maxrank = wbits + 1
    alpha_c = repr(0.7213 / (1 + 1.079 / m) * m * m * float(1 << maxrank))
    k = f"{key}, " if key else ""
    kgrp = f"GROUP BY {key}" if key else ""
    exact_cte = (
        f""",
    exact AS (SELECT {k}CAST(count(DISTINCT tok) AS BIGINT) AS n_exact
              FROM toks {kgrp})"""
        if include_exact
        else ""
    )
    exact_col = "exact.n_exact," if include_exact else ""
    exact_from = (
        (f"JOIN exact USING ({key})" if key else ", exact") if include_exact else ""
    )
    return rf"""
    WITH toks AS (
      SELECT {k}unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    h AS (SELECT {k}{md5_long_duck('tok')} AS h FROM toks),
    reg AS (
      SELECT {k}h & {m - 1} AS register,
             max(CASE WHEN (h >> {p}) = 0 THEN {maxrank}
                      ELSE {wbits} - length(bin(h >> {p})) + 1 END) AS rank
      FROM h GROUP BY {k}register
    ),
    agg AS (
      SELECT {k}CAST(count(*) AS BIGINT) AS nonzero,
             CAST(sum(CAST(1 AS BIGINT) << ({maxrank} - rank)) AS BIGINT)
               AS s_touched
      FROM reg {kgrp}
    ),
    est AS (
      SELECT {k}nonzero,
             {m} - nonzero AS zeros,
             {alpha_c}
               / CAST(s_touched
                      + ({m} - nonzero) * (CAST(1 AS BIGINT) << {maxrank})
                      AS DOUBLE) AS raw
      FROM agg
    ){exact_cte}
    SELECT {'est.' + key + ',' if key else ''} {exact_col}
           est.nonzero AS registers_touched,
           round(CASE WHEN est.raw <= {2.5 * m} AND est.zeros > 0
                      THEN {float(m)} * ln(CAST({m} AS DOUBLE) / est.zeros)
                      ELSE est.raw END, 6) AS hll_estimate
    FROM est {exact_from}
    """


def _hll_token_hashes(spark, sf_dir, keys=()):
    """(keys..., h) — md5_long over the lowercased whitespace token
    stream; the shared scan for every HLL variant."""
    d = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", *keys, "text"), "doc_id"
    )
    toks = d.select(
        *keys,
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    )
    return toks.select(*keys, md5_long(F.col("tok")).alias("h")), toks


def _hll_estimate(hh, p, keys=()):
    """Fold (keys..., h) down to (keys..., registers_touched,
    hll_estimate): register = low p bits, rank = LZC of the remaining
    bits + 1, exact-BIGINT harmonic sum, linear-counting branch. The
    shuffle carries at most m = 2^p rows per (key, mapper) — never the
    token universe."""
    m = 1 << p
    wbits = 60 - p
    maxrank = wbits + 1
    alpha_c = 0.7213 / (1 + 1.079 / m) * m * m * float(1 << maxrank)
    w = F.shiftrightunsigned(F.col("h"), p)
    rank = (
        F.when(w == 0, F.lit(maxrank))
        .otherwise(F.lit(wbits) - F.length(F.bin(w)) + F.lit(1))
    )
    reg = (
        hh.select(
            *keys,
            F.col("h").bitwiseAND(F.lit(m - 1)).alias("register"),
            rank.alias("rank"),
        )
        .groupBy(*keys, "register")
        .agg(F.max("rank").alias("rank"))
    )
    agg = reg.groupBy(*keys).agg(
        F.count("*").alias("nonzero"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {maxrank} - rank)")
        ).alias("s_touched"),
    )
    zeros = F.lit(m) - F.col("nonzero")
    s_full = (
        F.col("s_touched")
        + zeros.cast("long") * F.lit(1 << maxrank).cast("long")
    ).cast("double")
    raw = F.lit(alpha_c) / s_full
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return agg.select(
        *keys,
        F.col("nonzero").alias("registers_touched"),
        F.round(
            F.when((raw <= F.lit(2.5 * m)) & (zeros > 0), linear).otherwise(raw),
            6,
        ).alias("hll_estimate"),
    )


@register("hll_distinct_tokens", _hll_oracle_sql())
def hll_distinct_tokens(spark, sf_dir, p: int = _HLL_P):
    """Distinct-token cardinality via a CROSS-ENGINE HyperLogLog (Flajolet
    2007): register = low p bits of md5_long(token), rank = leading-zero
    count of the remaining 48 bits + 1 (via length(bin(w)) — identical
    integer/string algebra in Spark and DuckDB), estimate = bias-corrected
    harmonic mean with the small-range linear-counting correction.

    Exactness discipline: the harmonic sum Σ 2^-rank is computed as the
    EXACT BIGINT Σ 2^(49-rank) (max term 2^49, 4096 terms: < 2^61 — no
    float, no ordering sensitivity); untouched registers contribute
    (m - touched)·2^49 in one closed-form term. The only floats are the
    final constant/S division and the ln — single expressions over exact
    integers, bit-identical cross-engine. This is the driver-checkable
    twin of operators/hll.py (xxhash64, collected-register estimator);
    same algorithm, different hash domain — both pinned by tests.

    Scale shape: ONE scan -> explode -> groupBy(register) with map-side
    partial max — the shuffle carries at most m = 4096 rows per mapper,
    NOT the token universe; the final agg is 1 row. The n_exact column
    (a real countDistinct, a full shuffle of the vocabulary) exists so
    the query doubles as its own accuracy evaluation — the production
    probe WITHOUT that branch is registered as `hll_distinct_tokens_probe`
    (plan-shape-pinned: no distinct-aggregate Exchange).
    """
    hh, toks = _hll_token_hashes(spark, sf_dir)
    est = _hll_estimate(hh, p)
    exact = toks.agg(F.count_distinct("tok").alias("n_exact"))
    return est.crossJoin(F.broadcast(exact)).select(
        "n_exact", "registers_touched", "hll_estimate"
    )


@register(
    "hll_distinct_tokens_probe", _hll_oracle_sql(include_exact=False)
)
def hll_distinct_tokens_probe(spark, sf_dir, p: int = _HLL_P):
    """The PRODUCTION shape of `hll_distinct_tokens`: the identical
    register fold and estimator, with the exact count_distinct branch
    dropped — this is the plan a 100 TB cardinality probe actually runs.
    The whole job is one corpus scan whose only wide exchange carries at
    most m = 4096 (register, rank) rows per mapper; there is NO
    distinct-aggregate Exchange anywhere in the plan
    (tests/test_plan_shapes.py pins that shape). Accuracy evidence lives in
    the self-evaluating twin, which shares every expression via
    _hll_token_hashes/_hll_estimate."""
    hh, _ = _hll_token_hashes(spark, sf_dir)
    return _hll_estimate(hh, p)


@register(
    "hll_distinct_tokens_by_source",
    _hll_oracle_sql(include_exact=True, key="source"),
)
def hll_distinct_tokens_by_source(spark, sf_dir, p: int = _HLL_P):
    """GROUPED HyperLogLog: per-source distinct-token estimates from one
    scan — the per-host frontier-health shape (distinct URLs per host,
    distinct tokens per publisher) that powers crawl monitoring at scale.
    Same cross-engine register algebra as `hll_distinct_tokens`, keyed by
    source: the shuffle is bounded by |sources| x m register rows with
    map-side partial max, never the per-source token universe; the
    grouped exact branch rides along as the accuracy column (at 100 TB
    the probe form drops it, exactly as in the ungrouped pair).
    Register-table form for streaming merges: streaming/cardinality.py
    (hll_registers_by)."""
    hh, toks = _hll_token_hashes(spark, sf_dir, keys=("source",))
    est = _hll_estimate(hh, p, keys=("source",))
    exact = toks.groupBy("source").agg(F.count_distinct("tok").alias("n_exact"))
    return est.join(exact, "source").select(
        "source", "n_exact", "registers_touched", "hll_estimate"
    )


_CMS_D, _CMS_W = 4, 2048
_CMS_PROBES = ["spark", "window", "merge"]


def _cms_oracle_sql(
    depth: int = _CMS_D, width: int = _CMS_W, include_exact: bool = True
) -> str:
    probes = ", ".join(f"('{t}')" for t in _CMS_PROBES)
    h = md5_long_duck("tok || '#cms' || CAST(d AS VARCHAR)")
    hp = md5_long_duck("t || '#cms' || CAST(d AS VARCHAR)")
    exact_cte = (
        f""",
    exact AS (
      SELECT tok AS token, CAST(count(*) AS BIGINT) AS n_exact
      FROM toks WHERE tok IN (SELECT t FROM (VALUES {probes}) v(t))
      GROUP BY tok
    )"""
        if include_exact
        else ""
    )
    final = (
        """SELECT est.token, exact.n_exact, est.cms_estimate
    FROM est JOIN exact USING (token)"""
        if include_exact
        else "SELECT est.token, est.cms_estimate FROM est"
    )
    return rf"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    depths AS (SELECT unnest(range(0, {depth})) AS d),
    counts AS (
      SELECT d, {h} % {width} AS col, CAST(count(*) AS BIGINT) AS c
      FROM toks CROSS JOIN depths GROUP BY d, col
    ),
    probes AS (
      SELECT t, d, {hp} % {width} AS col
      FROM (VALUES {probes}) p(t) CROSS JOIN depths
    ),
    est AS (
      SELECT p.t AS token, CAST(min(c.c) AS BIGINT) AS cms_estimate
      FROM probes p JOIN counts c ON p.d = c.d AND p.col = c.col
      GROUP BY p.t
    ){exact_cte}
    {final}
    """


@register("cms_token_frequency", _cms_oracle_sql())
def cms_token_frequency(spark, sf_dir, depth: int = _CMS_D, width: int = _CMS_W):
    """Count-min-sketch point frequencies (Cormode & Muthukrishnan 2005)
    for a fixed probe-token set, with the exact counts alongside — the
    overestimate-only contract (estimate >= exact, error <= eN/w w.h.p.)
    is visible in the output itself. Cross-engine twin of operators/cms.py
    (xxhash64, production JVM path): same cell algebra, md5_long hashing
    with the same '#cms<d>' per-depth salt, so the DuckDB oracle
    recomputes every cell count exactly — the third sketch (after
    minhash and HLL) to graduate from rows-only to a full driver oracle.

    Scale shape: ONE corpus scan posexplodes each token into its d cells;
    the (row, col) shuffle is bounded by d·w distinct keys TOTAL with
    map-side partial aggregation (never the token universe); probes are a
    d·|probe| literal dim, broadcast; the exact branch exists for the
    accuracy story — the production probe WITHOUT it is registered as
    `cms_token_frequency_probe` (plan-shape-pinned).
    """
    toks, est = _cms_estimates(spark, sf_dir, depth, width)
    exact = (
        toks.where(F.col("tok").isin(_CMS_PROBES))
        .groupBy(F.col("tok").alias("token"))
        .agg(F.count("*").alias("n_exact"))
    )
    return est.join(exact, "token").select("token", "n_exact", "cms_estimate")


def _cms_token_stream(spark, sf_dir):
    """The lowered whitespace token stream every CMS query sketches."""
    d_t = _spread(
        _t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    return d_t.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )


def _cms_cell_expr(d: int, width: int):
    """Column: the depth-``d`` cell of the current row's ``tok``."""
    return F.pmod(md5_long(F.concat(F.col("tok"), F.lit(f"#cms{d}"))), F.lit(width))


def _cms_counts(toks, depth: int, width: int):
    """(row, col, c) cell counts — the sketch itself, d·w rows max."""
    buckets = F.array(*[_cms_cell_expr(d, width) for d in range(depth)])
    return (
        toks.select(F.posexplode(buckets).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("c"))
    )


def _cms_estimates(spark, sf_dir, depth: int = _CMS_D, width: int = _CMS_W):
    """(token stream, per-probe CMS estimates) — the shared core of the
    self-evaluating query and the production probe."""
    toks = _cms_token_stream(spark, sf_dir)
    counts = _cms_counts(toks, depth, width)
    from ..functions.hashing import md5_long_py

    probe_rows = [
        (t, d, md5_long_py(f"{t}#cms{d}") % width)
        for t in _CMS_PROBES
        for d in range(depth)
    ]
    probes = spark.createDataFrame(probe_rows, "token string, row int, col long")
    est = (
        probes.join(counts, ["row", "col"])
        .groupBy("token")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return toks, est


@register(
    "cms_token_frequency_probe",
    _cms_oracle_sql(include_exact=False),
)
def cms_token_frequency_probe(
    spark, sf_dir, depth: int = _CMS_D, width: int = _CMS_W
):
    """The PRODUCTION shape of `cms_token_frequency`: identical cell
    algebra and probe join, with the exact per-probe count branch
    dropped — the plan a 100 TB frequency probe actually runs. One corpus
    scan; the only wide exchange is the (row, col) cell aggregation
    bounded by d·w keys with map-side partials; the probe dim is a
    broadcast literal. No token-keyed Exchange anywhere
    (tests/test_plan_shapes.py pins the shape). Accuracy evidence lives in
    the self-evaluating twin, which shares every expression via
    _cms_estimates."""
    _, est = _cms_estimates(spark, sf_dir, depth, width)
    return est.select("token", "cms_estimate")


_CMS_HH_DENOM = 2000


def _cms_hh_oracle_sql(
    depth: int = _CMS_D, width: int = _CMS_W, denom: int = _CMS_HH_DENOM
) -> str:
    h = md5_long_duck("tok || '#cms' || CAST(d AS VARCHAR)")
    hd = md5_long_duck("dd.tok || '#cms' || CAST(dep.d AS VARCHAR)")
    return rf"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ),
    depths AS (SELECT unnest(range(0, {depth})) AS d),
    counts AS (
      SELECT d, {h} % {width} AS col, CAST(count(*) AS BIGINT) AS c
      FROM toks CROSS JOIN depths GROUP BY d, col
    ),
    total AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM counts WHERE d = 0),
    dist AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY tok
    ),
    est AS (
      SELECT dd.tok, CAST(min(c.c) AS BIGINT) AS cms_estimate
      FROM dist dd CROSS JOIN depths dep
      JOIN counts c ON c.d = dep.d AND c.col = {hd} % {width}
      GROUP BY dd.tok
    )
    SELECT d.tok AS token, d.n_exact, e.cms_estimate,
           t.n_total // {denom} AS threshold
    FROM dist d JOIN est e USING (tok) CROSS JOIN total t
    WHERE e.cms_estimate >= t.n_total // {denom}
    """


@register("cms_heavy_hitters", _cms_hh_oracle_sql())
def cms_heavy_hitters(
    spark,
    sf_dir,
    depth: int = _CMS_D,
    width: int = _CMS_W,
    denom: int = _CMS_HH_DENOM,
):
    """Heavy hitters (tokens with frequency >= N/denom) via a
    BROADCAST-SKETCH SEMI-FILTER — the batch form of CMS+heap
    (Cormode & Muthukrishnan 2005 §3.3) that never shuffles the token
    universe:

    pass 1 builds the d·w-cell sketch (the same `_cms_counts` exchange as
    `cms_token_frequency`, bounded by d·w keys with map-side partials);
    pass 2 re-scans the token stream and joins each occurrence's d cells
    against the BROADCAST per-depth cell slices (w rows each), so every
    occurrence learns its estimate min(c_0..c_{d-1}) MAP-SIDE; only
    occurrences whose estimate clears the threshold reach the final
    token-keyed aggregation. The threshold N/denom is derived from the
    sketch itself (row 0's cells sum to N exactly) — no extra corpus scan.

    Why this scales: the only token-keyed exchange carries survivor
    occurrences AFTER map-side partial counting, i.e. at most
    (#partitions x #candidates) rows; candidates are bounded because each
    sketch row sums to N, so at most ~denom cells per row can clear
    N/denom (plus CMS's false-positive tail — visible in the output,
    since the exact count rides along and may be < threshold). The
    sketch is an 8 KB-row broadcast at any corpus size.

    The DuckDB oracle recomputes every cell, the threshold, and the
    per-token minima exactly over the same md5 cell algebra (integer-only
    — bit-identical cross-engine)."""
    from pyspark import StorageLevel

    toks = _cms_token_stream(spark, sf_dir)
    # the sketch has five consumers (four per-depth broadcast slices + the
    # row-0 total); left lazy, each re-runs the sketch-building corpus
    # scan (measured r06: 6 scans) — persist the <= d*w-row frame so the
    # corpus is sketched once and re-scanned once (the probe pass)
    counts = _cms_counts(toks, depth, width).persist(StorageLevel.MEMORY_AND_DISK)
    total = counts.where(F.col("row") == 0).agg(
        F.sum("c").cast("long").alias("n_total")
    )
    cand = toks
    for d in range(depth):
        cell = counts.where(F.col("row") == d).select(
            F.col("col").alias(f"col{d}"), F.col("c").alias(f"c{d}")
        )
        cand = cand.withColumn(f"col{d}", _cms_cell_expr(d, width)).join(
            F.broadcast(cell), f"col{d}"
        )
    est = F.least(*[F.col(f"c{d}") for d in range(depth)])
    return (
        cand.select(F.col("tok").alias("token"), est.alias("cms_estimate"))
        .crossJoin(F.broadcast(total))
        .where(F.col("cms_estimate") >= F.expr(f"n_total DIV {denom}"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_exact"),
            F.min("cms_estimate").alias("cms_estimate"),
            F.min(F.expr(f"n_total DIV {denom}")).alias("threshold"),
        )
        .select("token", "n_exact", "cms_estimate", "threshold")
    )


# ===========================================================================
# Signature-Jaccard estimation (the sketch carrying its own error bar)
# ===========================================================================


def _minhash_jaccard_oracle_sql(bucket_cap: int = 64) -> str:
    """DuckDB twin of minhash_jaccard_estimates: the shared minhash CTE
    chain (_minhash_cte — identical hashes, permutations, banding, cap),
    then per candidate pair the signature agreement count, the estimated
    Jaccard (matches/16) and the exact Jaccard over the distinct 3-gram
    shingle space."""
    matches = " + ".join(
        f"(CASE WHEN sa.h{i} = sb.h{i} THEN 1 ELSE 0 END)" for i in range(16)
    )
    return rf"""
    WITH {_minhash_cte(bucket_cap)},
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    m AS (
      SELECT p.doc_a, p.doc_b, CAST({matches} AS BIGINT) AS sig_matches
      FROM pairs p
      JOIN sig sa ON p.doc_a = sa.doc_id
      JOIN sig sb ON p.doc_b = sb.doc_id
    ),
    cd AS (SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs),
    cg AS (SELECT g0.doc_id, g0.g FROM g0 JOIN cd USING (doc_id)),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM cg GROUP BY doc_id),
    isect AS (
      SELECT p.doc_a, p.doc_b, CAST(count(*) AS BIGINT) AS isect
      FROM pairs p
      JOIN cg a ON a.doc_id = p.doc_a
      JOIN cg b ON b.doc_id = p.doc_b AND b.g = a.g
      GROUP BY p.doc_a, p.doc_b
    )
    SELECT m.doc_a, m.doc_b, m.sig_matches,
           round(CAST(m.sig_matches AS DOUBLE) / 16, 6) AS jaccard_est,
           round(CAST(coalesce(i.isect, 0) AS DOUBLE)
                 / CAST(za.sz + zb.sz - coalesce(i.isect, 0) AS DOUBLE), 6)
             AS jaccard_exact
    FROM m
    LEFT JOIN isect i ON i.doc_a = m.doc_a AND i.doc_b = m.doc_b
    JOIN sz za ON za.doc_id = m.doc_a
    JOIN sz zb ON zb.doc_id = m.doc_b
    """


@register("minhash_jaccard_estimates", _minhash_jaccard_oracle_sql())
def minhash_jaccard_estimates(spark, sf_dir, bucket_cap: int = 64):
    """Per-candidate-pair Jaccard ESTIMATION from the minwise signatures,
    with the exact shingle Jaccard alongside — the canonical LSH verify
    stage (Broder 1997: P[h_min(A) = h_min(B)] = J(A,B), so the fraction
    of agreeing signature components is an unbiased 16-sample estimate).
    Output: (doc_a, doc_b, sig_matches, jaccard_est, jaccard_exact).

    Scale shape — why this is the 100 TB verify plan: the corpus is
    sketched ONCE — ``sigs`` is PERSISTED (the materialized
    signature-table step every production LSH pipeline has; 17 ints/doc,
    MEMORY_AND_DISK) because Catalyst/AQE do NOT reuse the aggregation
    exchange across its five consumers (measured r06: the lazy form
    fanned out to 46 parquet scans of `documents`, re-running the
    shingle->md5->min pass ~two dozen times). ``cand`` and the candidate
    gram sets are persisted too — both are LSH-pruned, orders of
    magnitude below corpus size. The exact-Jaccard quadratic is confined
    to CANDIDATE pairs, never the corpus, and candidate docs are
    semi-join-pruned BEFORE their shingle sets are re-derived, so the
    gram explode+distinct — the token-universe shuffle — runs over
    candidate docs only. The three caches are scoped to the returned
    plan's lifetime (caller-owned, same contract as
    ``prepare_training_data``'s ``keyed`` stage — unpersist via
    ``spark.catalog.clearCache()`` when re-running in a long session).
    Full DuckDB value oracle via the shared _minhash_cte chain."""
    from pyspark import StorageLevel

    from ..operators.incremental_dedup import minhash_bands_of, minhash_signatures

    docs = _spread(_t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    sigs = minhash_signatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cand = _lsh_candidate_pairs(minhash_bands_of(sigs), bucket_cap).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sa = sigs.alias("sa")
    sb = sigs.alias("sb")
    matches = sum(
        (F.col(f"sa.h{i}") == F.col(f"sb.h{i}")).cast("int") for i in range(16)
    )
    with_sig = (
        cand.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", matches.cast("long").alias("sig_matches"))
    )
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    # the candidate doc set is LSH-pruned — small by construction; prune
    # the DOCS before shingling so the distinct-gram shuffle never sees
    # non-candidate text
    cgrams = (
        docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .select(
            "doc_id",
            F.explode(word_windows(ws_normalize(F.col("text")), 3)).alias("g"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    sizes = cgrams.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ga = cgrams.alias("ga")
    gb = cgrams.alias("gb")
    inter = (
        cand.join(ga, F.col("doc_a") == F.col("ga.doc_id"))
        .join(
            gb,
            (F.col("doc_b") == F.col("gb.doc_id"))
            & (F.col("ga.g") == F.col("gb.g")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("isect"))
    )
    za = sizes.alias("za")
    zb = sizes.alias("zb")
    isect = F.coalesce(F.col("isect"), F.lit(0)).cast("long")
    jexact = isect.cast("double") / (
        F.col("za.sz") + F.col("zb.sz") - isect
    ).cast("double")
    return (
        with_sig.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, F.col("doc_a") == F.col("za.doc_id"))
        .join(zb, F.col("doc_b") == F.col("zb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "sig_matches",
            F.round(F.col("sig_matches").cast("double") / F.lit(16.0), 6).alias(
                "jaccard_est"
            ),
            F.round(jexact, 6).alias("jaccard_exact"),
        )
    )
