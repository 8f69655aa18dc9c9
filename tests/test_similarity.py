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


def test_ivf_exact_within_probed_cells(spark):
    """IVF's contract: its result IS the exact top-k restricted to the
    probed cells (ranking correctness is data-independent; absolute recall
    on near-random vectors is ≈ the probed corpus fraction by construction,
    so it is only sanity-checked)."""
    import duckdb
    import numpy as np

    emb = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in emb])
    labels = np.array([r[1] for r in emb])
    X = np.array([r[2] for r in emb], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    cents = {}
    for lab in np.unique(labels):
        c = X[labels == lab].mean(axis=0)
        cents[lab] = c / np.linalg.norm(c)

    want: dict[int, set[int]] = {}
    for q in range(5):
        qv = Xn[ids == q][0]
        cell_cos = sorted(
            ((float(qv @ c), -lab) for lab, c in cents.items()), reverse=True
        )
        probe = {-lab for _, lab in cell_cos[:2]}
        mask = np.isin(labels, list(probe)) & (ids != q)
        sims = Xn[mask] @ qv
        cand_ids = ids[mask]
        order = np.lexsort((cand_ids, -sims))
        want[q] = set(cand_ids[order[:5]].tolist())

    ivf = _topk(spark, "ann_ivf_topk")
    assert ivf == want

    exact = _topk(spark, "ann_cosine_topk")
    recalls = [len(ivf[q] & exact[q]) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.15  # sanity floor, see docstring


def test_lsh_returns_bucketed_candidates(spark):
    exact = _topk(spark, "ann_cosine_topk")
    lsh = _topk(spark, "ann_lsh_topk")
    # LSH may lose whole queries whose bucket is a singleton, but whatever
    # it returns must rank within the bucket correctly (≤ k rows/query) and
    # achieve nonzero overlap with the exact neighbors overall
    assert all(len(v) <= 5 for v in lsh.values())
    overlap = sum(len(lsh.get(q, set()) & exact[q]) for q in exact)
    assert overlap > 0
