"""Similarity-search quality: the approximate paths (LSH buckets, IVF
cells) must recover most of the brute-force exact top-k — recall is the
contract an ANN index is graded on, not just "returns k rows"."""

from __future__ import annotations

from news_crawler_slm_spark.plans import REGISTRY

SF = "/root/testdata/sf0.01"


def _topk(spark, name):
    df = REGISTRY[name][0](spark, SF)
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def _kmeans_numpy_twin(ids, X, k_cells=10, max_iters=8):
    """Pure-numpy replication of catalog_dedup.ivf_kmeans_centroids:
    xxhash64 seed-pick init, Lloyd iterations with argmax-cosine assignment
    and EXACT integer-micro centroid means, stop on integer-state fixed
    point (same rule as the engine). Returns the learned centroid matrix."""
    import numpy as np

    from xxh64_oracle import xxh64_long

    order = sorted(range(len(ids)), key=lambda i: (xxh64_long(int(ids[i])), ids[i]))
    C = X[order[:k_cells]].astype(np.float64)
    dim = C.shape[1]
    micro = np.rint(X * 1e6).astype(np.int64)
    prev_state = None
    for _ in range(max_iters):
        Cu = C / np.linalg.norm(C, axis=1, keepdims=True)
        cells = (X @ Cu.T).argmax(axis=1)
        cnts, sums = {}, {}
        for c in np.unique(cells):
            m = micro[cells == c]
            cnts[int(c)] = m.shape[0]
            sums[int(c)] = m.sum(axis=0)
        state = {c: (cnts[c], tuple(sums[c].tolist())) for c in cnts}
        C = np.array(
            [[sums[c][d] / (cnts[c] * 1e6) for d in range(dim)] for c in sorted(cnts)]
        )
        if state == prev_state:
            break
        prev_state = state
    return C


def _ivf_numpy_twin(ids, X, k_cells=10, nprobe=2, k=5, max_iters=8):
    """Pure-numpy replication of the engine's whole IVF pipeline
    (catalog_dedup.ivf_kmeans_centroids + ann_ivf_topk): the k-means twin,
    then re-assignment to learned centroids, nprobe cell probe, exact
    re-rank."""
    import numpy as np

    C = _kmeans_numpy_twin(ids, X, k_cells=k_cells, max_iters=max_iters)
    cell_ids = list(range(C.shape[0]))
    C_unit = C / np.linalg.norm(C, axis=1, keepdims=True)

    assigned = np.array([cell_ids[i] for i in (X @ C_unit.T).argmax(axis=1)])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    want: dict[int, set[int]] = {}
    for q in range(5):
        qv = Xn[ids == q][0]
        cell_cos = qv @ Cn.T
        probe_order = sorted(range(len(cell_ids)), key=lambda i: (-cell_cos[i], cell_ids[i]))
        probe = {cell_ids[i] for i in probe_order[:nprobe]}
        mask = np.isin(assigned, list(probe)) & (ids != q)
        sims = Xn[mask] @ qv
        cand_ids = ids[mask]
        o = np.lexsort((cand_ids, -sims))
        want[q] = set(cand_ids[o[:k]].tolist())
    return want


def test_ivf_learned_cells_match_numpy_twin(spark):
    """IVF's contract: the learned k-means cells are reproduced bit-for-bit
    by the numpy twin (integer-micro centroid sums are order-independent),
    and the result IS the exact top-k restricted to the probed cells."""
    import duckdb
    import numpy as np

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float64)

    want = _ivf_numpy_twin(ids, X)
    ivf = _topk(spark, "ann_ivf_topk")
    assert ivf == want

    exact = _topk(spark, "ann_cosine_topk")
    recalls = [len(ivf[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.15  # random corpus: see docstrings


def _planted_corpus(tmp_path_factory):
    """A genuinely CLUSTERED corpus (10 tight clusters, within-cluster
    cosine ~0.9 — the shape of real text-embedding neighborhoods). The
    driver's synthetic embeddings are isotropic-random: top-5 'neighbors'
    there have cosine ~0.32 (near-orthogonal), and no LSH family can
    recover near-orthogonal neighbors without scanning ~everything — so the
    >=0.8 recall contract is asserted here, where near neighbors exist."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n_clusters, per, dim = 10, 50, 64
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    X = np.repeat(centers, per, axis=0) + 0.06 * rng.normal(
        size=(n_clusters * per, dim)
    )
    n = n_clusters * per
    d = str(tmp_path_factory.mktemp("planted_emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [X[i].astype(np.float32).tolist() for i in range(n)],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([i // per for i in range(n)], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    # exact top-5 on the float32-cast vectors (what the engine reads)
    Xf = X.astype(np.float32).astype(np.float64)
    Xn = Xf / np.linalg.norm(Xf, axis=1, keepdims=True)
    S = Xn @ Xn.T
    np.fill_diagonal(S, -2)
    exact = {i: set(np.argsort(-S[i])[:5].tolist()) for i in range(n)}
    return d, exact, n


def test_lsh_recall_on_clustered_corpus(spark, tmp_path_factory):
    """THE multi-band LSH contract: recall@5 >= 0.8 vs exact brute force on
    a clustered corpus (measured 0.92 with the engine's deterministic
    hash-planes; everything here is deterministic, so no flake margin is
    needed beyond the 0.85 floor)."""
    d, exact, n = _planted_corpus(tmp_path_factory)
    df = REGISTRY["ann_lsh_topk"][0](spark, d)
    lsh: dict[int, set[int]] = {}
    for r in df.collect():
        lsh.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [len(lsh.get(i, set()) & exact[i]) / 5 for i in range(n)]
    assert sum(recalls) / n >= 0.85

    # IVF on the same corpus: cells == real clusters -> near-perfect recall
    ivf_df = REGISTRY["ann_ivf_topk"][0](spark, d)
    ivf: dict[int, set[int]] = {}
    for r in ivf_df.collect():
        ivf.setdefault(r.query_id, set()).add(r.vec_id)
    ivf_recalls = [len(ivf.get(q, set()) & exact[q]) / 5 for q in range(5)]
    assert sum(ivf_recalls) / 5 >= 0.9


def test_ivf_multiprobe_recall_dominates_single_probe(spark, tmp_path_factory):
    """Multi-probe IVF's reason to exist: boundary vectors (nearest cell !=
    the neighbor's cell) are recovered by probing more cells. On the
    clustered corpus, recall@5 at nprobe=2 must be >= nprobe=1 per query
    and the numpy twin must agree with the engine at BOTH settings — the
    probe loop is exercised end-to-end, not just defaulted."""
    import duckdb
    import numpy as np

    from news_crawler_slm_spark.plans import catalog_dedup as D

    d, exact, _n = _planted_corpus(tmp_path_factory)
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{d}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float64)

    recalls = {}
    for nprobe in (1, 2):
        df = D.ann_ivf_topk(spark, d, nprobe=nprobe)
        got: dict[int, set[int]] = {}
        for r in df.collect():
            got.setdefault(r.query_id, set()).add(r.vec_id)
        assert got == _ivf_numpy_twin(ids, X, nprobe=nprobe)
        recalls[nprobe] = {q: len(got.get(q, set()) & exact[q]) / 5 for q in range(5)}

    # probing a second cell can only widen the candidate set: per-query
    # recall must dominate, and in aggregate it must not regress
    for q in range(5):
        assert recalls[2][q] >= recalls[1][q]
    assert sum(recalls[2].values()) >= sum(recalls[1].values())


def test_lsh_on_random_corpus_floor(spark):
    """On the driver's isotropic-random corpus the information-theoretic
    ceiling for bounded-candidate LSH is low; pin the measured floor
    (0.080 with 8 bands x 8 bits of md5-derived planes — r05 re-measure;
    the xxhash planes measured 0.147, both noise-level draws on a corpus
    with near-orthogonal "neighbors") so regressions in the banding still
    surface, and keep the per-query k bound. The actual recall contract
    is the clustered-corpus >= 0.85 above."""
    exact = _topk(spark, "ann_cosine_topk")
    lsh = _topk(spark, "ann_lsh_topk")
    assert all(len(v) <= 5 for v in lsh.values())
    recalls = [len(lsh.get(q, set()) & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.07


def _semdedup_numpy_twin(ids, X, k_cells=10, tau=0.7, max_iters=8):
    """Pure-numpy replication of catalog_dedup.semdedup_prune, including
    the IDENTICAL 4096-row blocked Gram computation (same shapes -> same
    BLAS kernels -> bit-identical doubles before the 6-decimal round)."""
    import numpy as np

    C = _kmeans_numpy_twin(ids, X, k_cells=k_cells, max_iters=max_iters)
    C_unit = C / np.linalg.norm(C, axis=1, keepdims=True)
    assigned = (X @ C_unit.T).argmax(axis=1)

    want = {}
    for c in np.unique(assigned):
        mask = assigned == c
        cids = ids[mask]
        o = np.argsort(cids)
        cids, M = cids[o], X[mask][o]
        Xn = M / np.linalg.norm(M, axis=1, keepdims=True)
        n = len(cids)
        best = np.full(n, -np.inf)
        block = 4096
        for s in range(1, n, block):
            e = min(s + block, n)
            G = Xn[s:e] @ Xn[:e].T
            for j in range(s, e):
                best[j] = G[j - s, :j].max()
        for j in range(n):
            want[int(cids[j])] = (
                int(c),
                bool(best[j] >= tau),
                None if np.isinf(best[j]) else round(float(best[j]), 6),
            )
    return want


def _semdedup_rows(df):
    return {
        r.vec_id: (r.cell, r.pruned, r.max_prior_cos) for r in df.collect()
    }


def test_semdedup_matches_numpy_twin(spark):
    """SemDeDup's contract: the engine's (cell, pruned, max_prior_cos) per
    vector is reproduced exactly by the numpy twin — learned cells AND the
    blocked within-cell prefix-max cosine are deterministic."""
    import duckdb
    import numpy as np

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    X = np.array([r[1] for r in emb], dtype=np.float64)

    got = _semdedup_rows(REGISTRY["semdedup_prune"][0](spark, SF))
    want = _semdedup_numpy_twin(ids, X)
    assert got == want
    # isotropic-random corpus: near-orthogonal vectors, nothing at cos>=0.7
    assert not any(p for (_c, p, _m) in got.values())


def test_semdedup_prunes_planted_clusters(spark, tmp_path_factory):
    """On the clustered corpus (within-cluster cosine ~0.9) SemDeDup must
    prune most of each semantic group while KEEPING the smallest id of
    every cell (the deterministic keeper rule): the survivor set is small
    but never empty per cell."""
    from news_crawler_slm_spark.plans import catalog_dedup as D

    d, _exact, n = _planted_corpus(tmp_path_factory)
    got = _semdedup_rows(D.semdedup_prune(spark, d, tau=0.8))
    assert len(got) == n
    by_cell: dict[int, list[int]] = {}
    for vid, (cell, pruned, _m) in got.items():
        if not pruned:
            by_cell.setdefault(cell, []).append(vid)
    # every cell keeps its smallest id, and the prune rate on 10 tight
    # clusters of 50 is high (most members are semantic dups of the keeper)
    for cell, keepers in by_cell.items():
        cell_ids = [v for v, (c, _p, _m) in got.items() if c == cell]
        assert min(cell_ids) in keepers
    pruned_n = sum(1 for (_c, p, _m) in got.values() if p)
    assert pruned_n >= 0.6 * n


def test_persistent_ivf_index_matches_inline_query(spark, tmp_path):
    """build_ivf_index + search_ivf must return exactly what the inline
    train-and-search query (ann_ivf_topk, twin-verified above) returns for
    the same corpus and parameters — and a rebuilt index commits a NEW
    snapshot while searches keep working (versioned index)."""
    from news_crawler_slm_spark.operators.ivf_index import (
        build_ivf_index,
        search_ivf,
    )
    from news_crawler_slm_spark.sources.tables import SnapshotCatalog
    from pyspark.sql import functions as F

    root = str(tmp_path / "ivf")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    build_ivf_index(spark, emb, root)

    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.transform("embedding", lambda x: x.cast("double")).alias("qe"),
    )
    got = {
        (r.query_id, r.vec_id, r.cosine)
        for r in search_ivf(spark, root, q).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.cosine)
        for r in REGISTRY["ann_ivf_topk"][0](spark, SF).collect()
    }
    assert got == want

    # rebuild: new snapshot id, identical results (deterministic training)
    build_ivf_index(spark, emb, root)
    cat = SnapshotCatalog(spark, root)
    assert cat.current_snapshot_id() == 2
    again = {
        (r.query_id, r.vec_id, r.cosine)
        for r in search_ivf(spark, root, q).collect()
    }
    assert again == got
