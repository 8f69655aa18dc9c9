"""Incremental MinHash near-dup index (operators/incremental_dedup.py):
increments must reproduce the batch pair set exactly (no bucket over cap),
the index probe must stay increment-sized, and the hot-bucket cap must be
monotone across increments."""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from news_crawler_slm_spark.operators.incremental_dedup import (
    incremental_neardup,
    minhash_bands,
)
from news_crawler_slm_spark.plans import catalog_dedup as D


def _pairs(df):
    return {(r["doc_a"], r["doc_b"]) for r in df.collect()}


def test_increments_equal_batch(spark, sf_dir, tmp_path):
    """Feed sf0.01 documents in 3 doc_id-sliced increments; the union of
    per-increment pairs must equal the batch minhash_lsh_candidates set
    (no bucket exceeds the cap on this corpus, so equality is exact)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    batch = _pairs(D.minhash_lsh_candidates(spark, sf_dir))
    assert batch  # the corpus really has near-dup candidates

    index = None
    got = set()
    for lo, hi in [(0, 170), (170, 340), (340, 10**9)]:
        inc = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        pairs, index = incremental_neardup(index, inc)
        # persist the index between increments, as a real pipeline would
        path = str(tmp_path / f"index_{lo}")
        index.write.parquet(path)
        index = spark.read.parquet(path)
        got |= _pairs(pairs)
    assert got == batch


def test_single_increment_equals_batch(spark, sf_dir):
    """Degenerate case: one increment over an empty index == batch."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    pairs, index = incremental_neardup(None, docs)
    assert _pairs(pairs) == _pairs(D.minhash_lsh_candidates(spark, sf_dir))
    # the index holds exactly the banding of the corpus
    assert index.count() == minhash_bands(docs).count()


def test_hot_bucket_cap_is_monotone(spark):
    """A boilerplate bucket filling up across increments: pairs emitted
    while under cap persist (append-only history), and once the combined
    membership crosses the cap the bucket emits nothing more — so the
    total never approaches m^2."""
    cap = 8
    mk = lambda ids: spark.createDataFrame(
        [(i, "spam spam spam spam spam spam spam") for i in ids],
        ["doc_id", "text"],
    )
    # increment 1: 5 identical docs (under cap) -> C(5,2) = 10 pairs
    p1, idx = incremental_neardup(None, mk(range(5)), bucket_cap=cap)
    n1 = p1.count()
    assert n1 == 10
    # increment 2: 10 more copies -> combined 15 > cap -> zero new pairs
    p2, idx = incremental_neardup(idx, mk(range(100, 110)), bucket_cap=cap)
    assert p2.count() == 0
    # increment 3: still over cap, still silent
    p3, _ = incremental_neardup(idx, mk(range(200, 203)), bucket_cap=cap)
    assert p3.count() == 0


def test_probe_joins_only_touched_buckets(spark, sf_dir):
    """The scale contract: the pair join must not see untouched index
    rows. An increment whose text shares no shingles with the corpus
    produces pairs only from its own buckets — and the probe's semi-join
    keeps the plan's index scan pruned to matching buckets."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    index = minhash_bands(docs)
    inc = spark.createDataFrame(
        [
            (900001, "qq ww ee rr tt yy uu ii oo pp"),
            (900002, "qq ww ee rr tt yy uu ii oo xx"),
        ],
        ["doc_id", "text"],
    )
    pairs, _ = incremental_neardup(index, inc)
    got = _pairs(pairs)
    # disjoint shingles -> no cross pairs with the corpus; the two new
    # docs share 3 of 4 bands -> they pair with each other
    assert got == {(900001, 900002)}


def test_crawl_snapshots_feed_incremental_index(spark, tmp_path):
    """Composition with the crawl engine: each crawl round's pages DELTA
    (read via snapshot time travel) is one dedup increment; after the
    crawl, the accumulated pair set equals a batch sketch over the final
    pages table. This is the production loop — the index grows with the
    crawl, no round ever re-sketches history."""
    from news_crawler_slm_spark.crawl.rounds import run_crawl, synthetic_fetcher
    from news_crawler_slm_spark.crawl.semantics import CrawlParams
    from news_crawler_slm_spark.sources.synthetic_web import WebScale, web_dataframes
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog

    params = CrawlParams(round_budget=6.0, max_articles=12, max_rounds=4)
    dfs = web_dataframes(spark, WebScale(n_hosts=8, pages_per_host_max=10, seed=11))
    root = str(tmp_path / "cat")
    run_crawl(spark, root, dfs["seeds"], dfs["robots"], synthetic_fetcher(dfs["web"]), params)
    catalog = SnapshotCatalog(spark, root)

    def _docs(df):
        return df.select(F.xxhash64("url").alias("doc_id"), "text")

    chain = list(reversed(catalog.lineage()))  # root -> current
    index, got = None, set()
    prev_sid = None
    for snap in chain:
        if "pages" not in snap.tables:
            continue
        # changed-data capture: ONLY the delta files this round appended —
        # O(new pages), never a scan (or anti-join) of crawl history
        inc = _docs(
            catalog.read_table("pages", snap.snapshot_id)
            if prev_sid is None
            else catalog.read_table_incremental("pages", prev_sid, snap.snapshot_id)
        )
        if inc.take(1):
            pairs, index = incremental_neardup(index, inc)
            got |= _pairs(pairs)
        prev_sid = snap.snapshot_id

    # batch twin over the final corpus
    final = _docs(catalog.read_table("pages"))
    batch_pairs, _ = incremental_neardup(None, final)
    assert got == _pairs(batch_pairs)
    # a multi-round crawl really produced multiple increments
    assert len([s for s in chain if "pages" in s.tables]) >= 3
