"""Distributed PageRank over a link graph with EXACT integer arithmetic.

The frontier's OPIC-lite re-prioritization (crawl/frontier.py:
reprioritize_frontier) blends raw in-degree; PageRank is the fixed-point
version of that signal — what large crawl schedulers actually rank hosts
and URLs by. The reference has no link analysis at all (it crawls a fixed
publisher list, crawl_articles.py); this operator exists for the open-web
tier where the frontier is 10^10 URLs and "what the web values" must be
computed, not configured.

Determinism contract (same discipline as ivf_kmeans_centroids /
unigram_perplexity): every iteration is pure 64-bit integer arithmetic in
micro-rank units —

  contrib(e)   = rank_micro[src] // outdeg[src]        (exact int division)
  rank'_micro  = teleport + (d_num * (Σ contrib + dangling_share)) // d_den

so the reduction is order-independent and the trajectory is bit-identical
on any partitioning, replicated exactly by the pure-python twin in
tests/test_pagerank.py. The truncation each step loses < 1 micro-unit per
edge — irrelevant for ORDERING, which is what priorities are.

Scale shape: per iteration ONE shuffle joining ranks to edges on src
(edges pre-keyed by src; outdeg precomputed once and carried on the edge
rows, so no per-iteration degree join) and ONE aggregation shuffle on dst.
Dangling mass is a single scalar aggregate (O(1) driver state per
iteration — the only collect). Edges persist MEMORY_AND_DISK for the loop,
the standard cache-for-iterations trade.

Iteration discipline (the part that keeps this O(iters), not O(iters^2)):
each new rank frame is persisted and MATERIALIZED before its predecessor
is unpersisted. The materializing action is the dangling-mass aggregate
the NEXT iteration needs anyway, so the loop costs exactly one job per
iteration and the active lineage is always one step deep — never a replay
of the whole chain. tests/test_pagerank.py pins this by asserting the
executed-stage count per extra iteration is constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
# damping 0.85 as an exact rational so both engines/twins share it
D_NUM, D_DEN = 85, 100


def pagerank(edges: DataFrame, iters: int = 10, tol_micro: int = 0) -> DataFrame:
    """PageRank over (src, dst) string edges; returns (node, rank_micro,
    rank). Early-stops when the total absolute micro-rank change is
    <= tol_micro (0 = exact integer fixed point).

    Duplicate edges count once (a page linking twice is one endorsement —
    matches the seen-dedup discipline of the crawl); self-loops count.

    Cache contract (ADVICE r05): the RETURNED frame is the one persisted
    frame this call leaves behind, already materialized — call
    ``.unpersist()`` on it once its consumers have run (unpersisting
    earlier is safe but forces an O(iters) lineage replay on the next
    action). All loop-internal persists (edges, nodes, per-iteration rank
    frames) are released before returning, on the exception path too —
    a mid-loop failure leaves ZERO cached frames
    (tests/test_pagerank.py::test_pagerank_releases_cache_on_failure).
    """
    from pyspark import StorageLevel

    spark = edges.sparkSession
    e = edges.select("src", "dst").distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return spark.createDataFrame([], "node string, rank_micro long, rank double")

    outdeg = e.groupBy("src").agg(F.count("*").alias("outdeg"))
    # outdeg rides the edge rows: no per-iteration degree join
    ek = e.join(outdeg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ek.count()

    teleport = ((D_DEN - D_NUM) * MICRO) // (D_DEN * n_nodes)

    def dangling_mass(r: DataFrame) -> int:
        """Total micro-rank held by nodes with no out-edges. Also serves
        as the materializing action for a freshly-persisted rank frame:
        the aggregate job fills r's cache, truncating active lineage to
        one iteration before the predecessor is unpersisted."""
        return (
            r.join(outdeg, r.node == outdeg.src, "left_anti")
            .agg(F.coalesce(F.sum("rm"), F.lit(0)).cast("long"))
            .collect()[0][0]
        )

    ranks = nodes.select(
        "node", F.lit(MICRO // n_nodes).cast("long").alias("rm")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    # dangling nodes: their whole mass teleports uniformly. Computing it
    # here both yields the scalar this iteration needs AND materializes the
    # persisted frame (one job per iteration, no chain replay).
    dangling = dangling_mass(ranks)

    new_ranks = None
    ok = False
    try:
        for _ in range(iters):
            dangling_share = dangling // n_nodes
            contribs = (
                ek.join(ranks, ek.src == ranks.node)
                .select("dst", (F.col("rm") / F.col("outdeg")).cast("long").alias("c"))
                .groupBy("dst")
                .agg(F.sum("c").alias("s"))
            )
            new_ranks = (
                nodes.join(contribs, nodes.node == contribs.dst, "left")
                .select(
                    "node",
                    (
                        F.lit(teleport)
                        + (
                            F.lit(D_NUM)
                            * (F.coalesce(F.col("s"), F.lit(0)) + F.lit(dangling_share))
                        )
                        / F.lit(D_DEN)
                    )
                    .cast("long")
                    .alias("rm"),
                )
            ).persist(StorageLevel.MEMORY_AND_DISK)
            # materialize new_ranks (and fetch next iteration's dangling
            # scalar) BEFORE dropping the predecessor's cache — unpersisting
            # first would force every later job to replay the entire chain
            new_dangling = dangling_mass(new_ranks)
            if tol_micro > 0:
                delta = (
                    new_ranks.alias("a")
                    .join(ranks.alias("b"), "node")
                    .agg(F.sum(F.abs(F.col("a.rm") - F.col("b.rm"))))
                    .collect()[0][0]
                )
                ranks.unpersist()
                ranks, new_ranks, dangling = new_ranks, None, new_dangling
                if delta <= tol_micro:
                    break
            else:
                ranks.unpersist()
                ranks, new_ranks, dangling = new_ranks, None, new_dangling
        ok = True
    finally:
        ek.unpersist()
        nodes.unpersist()
        if not ok:
            # mid-loop failure: release the current ranks AND the
            # in-flight successor so no cached frame outlives the call
            ranks.unpersist()
            if new_ranks is not None:
                new_ranks.unpersist()

    # hand ownership of the single surviving cache to the CALLER: persist
    # the output projection, fill it from ranks' still-warm cache (one
    # cheap job), then drop the internal frame — the caller releases the
    # returned frame itself with .unpersist() when done
    out = ranks.select(
        "node",
        F.col("rm").alias("rank_micro"),
        (F.col("rm") / F.lit(float(MICRO))).alias("rank"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out.count()
    ranks.unpersist()
    return out
