"""PageRank operator: bit-exact vs a pure-python integer twin, plus the
ordering sanity a rank signal must have (hub outranks leaves, dangling
mass handled)."""

from __future__ import annotations

from news_crawler_slm_spark.operators.pagerank import D_DEN, D_NUM, MICRO, pagerank

EDGES = [
    # a tiny web: hub gets linked from everyone; one dangling node (sink)
    ("a", "hub"),
    ("b", "hub"),
    ("c", "hub"),
    ("hub", "a"),
    ("hub", "sink"),
    ("a", "b"),
    ("b", "c"),
    ("c", "a"),
    ("c", "a"),  # duplicate edge: counts once
]


def _twin(edges, iters=10):
    e = sorted(set(edges))
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    n = len(nodes)
    out = {}
    for s, _ in e:
        out[s] = out.get(s, 0) + 1
    teleport = ((D_DEN - D_NUM) * MICRO) // (D_DEN * n)
    rm = {v: MICRO // n for v in nodes}
    for _ in range(iters):
        dangling = sum(rm[v] for v in nodes if v not in out)
        share = dangling // n
        s = {v: 0 for v in nodes}
        for src, dst in e:
            s[dst] += rm[src] // out[src]
        rm = {v: teleport + (D_NUM * (s[v] + share)) // D_DEN for v in nodes}
    return rm


def test_pagerank_matches_integer_twin(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    got = {r.node: r.rank_micro for r in pagerank(df, iters=10).collect()}
    assert got == _twin(EDGES, iters=10)


def test_pagerank_ordering_and_dangling(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    res = {r.node: r.rank_micro for r in pagerank(df, iters=10).collect()}
    # the hub is linked by a, b, c: it must outrank every leaf
    assert res["hub"] == max(res.values())
    # the dangling sink still holds rank (hub links to it) and its mass
    # teleports rather than vanishing: every node keeps >= teleport
    n = len(res)
    teleport = ((D_DEN - D_NUM) * MICRO) // (D_DEN * n)
    assert all(v >= teleport for v in res.values())
    # mass is approximately conserved (truncation loses < 1 micro per term)
    assert abs(sum(res.values()) - MICRO) < 100 * n


def test_pagerank_early_stop_matches_full_run(spark):
    """tol_micro=0 runs all iterations; a tolerant run must agree with the
    twin at whatever iteration it stopped — monotone convergence means the
    ordering is already stable."""
    df = spark.createDataFrame(EDGES, "src string, dst string")
    loose = {r.node: r.rank_micro for r in pagerank(df, iters=50, tol_micro=50).collect()}
    tight = _twin(EDGES, iters=50)
    order_loose = sorted(loose, key=lambda v: (-loose[v], v))
    order_tight = sorted(tight, key=lambda v: (-tight[v], v))
    assert order_loose == order_tight


def _executed_stages(spark, group: str, iters: int) -> int:
    """Distinct stages actually EXECUTED by a pagerank run (skipped stages
    are never submitted, so they have no StageInfo — re-executed replay
    stages get fresh stage ids and DO count)."""
    sc = spark.sparkContext
    df = spark.createDataFrame(EDGES, "src string, dst string")
    sc.setJobGroup(group, f"pagerank iters={iters}")
    try:
        pagerank(df, iters=iters).collect()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    tracker = sc.statusTracker()
    executed = set()
    for jid in tracker.getJobIdsForGroup(group):
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        for sid in info.stageIds:
            if tracker.getStageInfo(sid) is not None:
                executed.add(sid)
    return len(executed)


def test_pagerank_constant_work_per_iteration(spark):
    """Each iteration must persist-and-materialize its rank frame before
    unpersisting the predecessor; otherwise iteration k silently replays
    iterations 1..k-1 from lineage and total work is O(iters^2). Pinned by
    requiring the executed-stage count to grow LINEARLY: the same stage
    delta for 2->4 as for 4->6 extra iterations."""
    s2 = _executed_stages(spark, "pr-stages-2", 2)
    s4 = _executed_stages(spark, "pr-stages-4", 4)
    s6 = _executed_stages(spark, "pr-stages-6", 6)
    assert s4 - s2 == s6 - s4, (s2, s4, s6)
    # and the per-iteration cost is a small constant (~23 with AQE giving
    # each exchange its own stage), not a replayed chain (which grows
    # per-iteration and fails the linearity check above first anyway)
    assert (s4 - s2) / 2 <= 30, (s2, s4, s6)


def test_pagerank_reprioritize_lifts_endorsed_frontier_url(spark):
    """The blend must lift a frontier URL the crawled web points at above
    an equal-priority sibling nobody links to, keep schema/columns, and
    leave priorities untouched at weight=0."""
    from news_crawler_slm_spark.crawl.frontier import (
        reprioritize_frontier_pagerank,
    )

    hot, cold = "https://w/hot", "https://w/cold"
    frontier = spark.createDataFrame(
        [(0, 0, "w", hot, 1, 5.0, 1, 1), (0, 1, "w", cold, 2, 5.0, 1, 1)],
        "bucket int, salt int, host string, url string, url_hash long,"
        " priority double, depth int, discovered_round int",
    )
    fetched = spark.createDataFrame(
        [
            (f"https://w/p{i}", [hot, f"https://w/p{(i + 1) % 4}"])
            for i in range(4)
        ],
        "url string, out_links array<string>",
    )
    out = {
        r.url: r.priority
        for r in reprioritize_frontier_pagerank(frontier, fetched).collect()
    }
    assert out[hot] > out[cold]
    assert out[cold] >= 5.0  # monotone: never demotes

    same = {
        r.url: r.priority
        for r in reprioritize_frontier_pagerank(frontier, fetched, weight=0.0).collect()
    }
    assert same == {hot: 5.0, cold: 5.0}
    cols = reprioritize_frontier_pagerank(frontier, fetched).columns
    assert cols == frontier.columns
