"""Deduplication, similarity search and crawl-analog plans (the
training-data-pipeline operator family + the frontier primitives expressed
over the driver's oracle-checkable tables).

Hash-based near-dup plans that depend on engine-specific hash functions
(xxhash64 vs DuckDB hash) register with oracle=None — the driver records a
rows-only check and the full value checks live in tests/ against pure-Python
oracles instead.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .catalog import _t, register

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
    ), grams AS (
      SELECT DISTINCT doc_id, source,
             unnest(list_transform(generate_series(1, len(t) - 2),
                                   i -> array_to_string(t[i:i+2], ' '))) AS g
      FROM toks WHERE len(t) >= 3
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
def ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup: distinct 3-gram shingles → inverted-index
    self-join (shuffle key = the shingle, never the document) → per-pair
    intersection counts → |A∩B| / (|A|+|B|-|A∩B|). Blocked by source so the
    candidate-pair blowup stays bounded (at 100 TB the block key is an LSH
    band — see minhash_lsh_candidates)."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    n = 3
    grams = (
        toks.where(F.size("t") >= n)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
                )
            ).alias("g"),
        )
        .distinct()
    )
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


@register("minhash_lsh_candidates", None)  # xxhash64-based: rows-only check
def minhash_lsh_candidates(spark, sf_dir):
    """MinHash + LSH near-dup candidates: 3-gram shingle → 16 minhash
    signatures via xxhash64(seed ⊕ shingle) → 4 bands × 4 rows → band-bucket
    join. The shuffle key is (band, bucket-hash) — constant width per doc
    regardless of document size; exact Jaccard verification then runs only
    inside candidate pairs. Pure-Python oracle in tests/test_dedup.py."""
    n, n_hashes, bands = 3, 16, 4
    rows_per_band = n_hashes // bands
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    grams = (
        toks.where(F.size("t") >= n)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - n),
                    lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)),
                )
            ).alias("g"),
        )
        .distinct()
    )
    sigs = grams.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.concat(F.lit(f"seed{i}:"), F.col("g")))).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    )
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    "|",
                    *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sigs.select("doc_id", F.explode(F.array(*band_cols)).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b_ = banded.alias("b")
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


@register("simhash_fingerprints", None)  # bit-ops on xxhash64: rows-only
def simhash_fingerprints(spark, sf_dir):
    """SimHash document fingerprints: per-token xxhash64 → 64 signed bit
    votes → sign aggregation → packed 64-bit fingerprint, entirely with
    built-in expressions (explode + bitwise ops; no Python). Near-dup =
    small Hamming distance (bit_count(a ^ b), tested in test_dedup.py)."""
    toks = _t(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    )
    h = toks.select("doc_id", F.xxhash64("tok").alias("h"))
    votes = h.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.col("h").bitwiseAND(F.lit(_bit(i))) != 0, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = None
    for i in range(64):
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
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
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


@register("ann_lsh_topk", None)  # random-hyperplane signs: engine-defined
def ann_lsh_topk(spark, sf_dir):
    """Scale-path ANN: random-hyperplane LSH. Each vector gets a sign-bit
    bucket from 8 deterministic pseudo-hyperplanes (hash-derived, no RNG
    state); candidates = same-bucket pairs; exact cosine re-ranks inside the
    bucket. Recall vs the brute-force baseline is asserted in
    tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    n_planes = 8
    # deterministic pseudo-hyperplane component for plane p, dim i:
    # centered hash in [-0.5, 0.5): (pmod(xxhash64(p,i),1000)/1000 - 0.5)
    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                F.col("e"),
                F.sequence(F.lit(0), F.size("e") - 1),
                lambda x, i: x
                * (
                    F.pmod(F.xxhash64(F.lit(p), i), F.lit(1000)).cast("double") / 1000.0
                    - 0.5
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = None
    for p in range(n_planes):
        bit = F.when(plane_dot(p) > 0, F.lit(_bit(p))).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket.bitwiseOR(bit)
    bucketed = emb.select("vec_id", "e", bucket.alias("bucket"))
    a = bucketed.alias("a")
    b = bucketed.alias("b")

    def dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, z: acc + z)

    cos = dot(F.col("a.e"), F.col("b.e")) / (
        F.sqrt(dot(F.col("a.e"), F.col("a.e"))) * F.sqrt(dot(F.col("b.e"), F.col("b.e")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("vec_id"),
            cos.alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
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
    e = _t(spark, sf_dir, "events")
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


@register("langid_heuristic", None)  # pandas-UDF heuristic: rows-only check
def langid_heuristic(spark, sf_dir):
    """Language-ID n-gram heuristic over documents (engine addition); the
    Arrow UDF path — accuracy vs the lang column is asserted in
    tests/test_text_ops.py."""
    from ..functions.udfs import detect_language_udf

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", detect_language_udf(F.col("text")).alias("lang_detected"))


@register("doc_fingerprints", None)  # xxhash64: rows-only check
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting: stable 64-bit content ids (xxhash64 of text)
    + first-8-token prefix hash for rolling/near-prefix grouping."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("fp64"),
        F.xxhash64(F.concat_ws(" ", F.slice(toks, 1, 8))).alias("prefix_fp"),
    )


@register("ann_ivf_topk", None)  # engine-defined cells: no SQL twin
def ann_ivf_topk(spark, sf_dir):
    """Scale-path ANN #2: IVF (inverted-file) search. Coarse cells = per-
    label centroids (at 100 TB the cells come from a k-means pass; the cell-
    probe plan below is identical). Each query probes the nprobe=2 nearest
    cells by centroid cosine, exact re-rank inside the probed cells only —
    the candidate set is bounded by cell sizes, never O(corpus). Recall vs
    the brute-force baseline is asserted in tests/test_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )

    def cos(a, b):
        return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))

    # centroids per cell, element-wise mean via posexplode -> re-assemble
    cent = (
        emb.select("label", F.posexplode("e").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(F.avg("x").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform("pm", lambda s: s.m).alias("centroid"))
    )

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe")
    )
    # probe: top-2 cells per query by centroid cosine (cells are few: broadcast)
    w_cell = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), "label")
    probed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("cell_cos", cos(F.col("qe"), F.col("centroid")))
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= 2)
        .select("query_id", "qe", "label")
    )
    # exact re-rank inside probed cells only
    cand = emb.join(F.broadcast(probed), "label").where(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        cand.select("query_id", "vec_id", cos(F.col("qe"), F.col("e")).alias("cos_raw"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "vec_id", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )
