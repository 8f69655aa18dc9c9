"""Persistent IVF index: build once (k-means + assignments committed to a
SnapshotCatalog), query many times — the shape a production ANN service
actually runs, vs ``ann_ivf_topk``'s self-contained train-and-search (kept
as the oracle-checked query form).

Build: the engine's deterministic k-means (catalog_dedup.
ivf_kmeans_centroids — xxhash64 seeding, exact integer-micro Lloyd steps)
plus one mapInPandas assignment pass; both the centroid table (k rows) and
the assignment table (one row per vector, partitioned by cell) commit
atomically as catalog snapshot 1. Rebuilds commit as new snapshots — the
index is versioned, time-travelable, and GC-able like any other engine
state.

Search: nearest-nprobe cell selection against the broadcast k-row
centroid table, then exact cosine re-rank INSIDE the probed cells only —
the candidate set is bounded by cell sizes. The cell-partitioned storage
layout means a probe reads only its cells' files (partition pruning on
disk, the on-disk analog of the inverted file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import SnapshotCatalog


def _unit_rows(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )


def build_ivf_index(
    spark: SparkSession, emb: DataFrame, root: str, k_cells: int = 10
) -> None:
    """Train and persist the index at ``root``: tables ``centroids``
    (cell, centroid) and ``assignments`` (vec_id, cell, e), the latter
    hive-partitioned by cell so probes prune at the file level."""
    import numpy as np
    import pandas as pd

    from ..plans.catalog_dedup import ivf_kmeans_centroids

    e = _unit_rows(emb)
    centroids = ivf_kmeans_centroids(spark, e, k_cells)
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

    assigned = e.mapInPandas(assign, schema="vec_id long, e array<double>, cell int")
    cent_df = spark.createDataFrame(
        [(c, centroids[c]) for c in cell_ids],
        T.StructType(
            [
                T.StructField("cell", T.IntegerType()),
                T.StructField("centroid", T.ArrayType(T.DoubleType())),
            ]
        ),
    )
    cat = SnapshotCatalog(spark, root)
    sid = (cat.current_snapshot_id() or 0) + 1
    cat.commit(
        sid,
        tables={"centroids": cent_df, "assignments": assigned},
        counters={"k_cells": len(cell_ids)},
        partition_by={"assignments": ["cell"]},
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cos(a, b):
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def search_ivf(
    spark: SparkSession,
    root: str,
    queries: DataFrame,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """Top-k cosine neighbors for ``queries`` (query_id, qe: array<double>)
    against the persisted index — NO training, no full scan: broadcast
    k-row centroid probe, then exact re-rank inside the probed cells
    (cell-partition pruning applies on disk). Self-matches
    (query_id == vec_id) are excluded, matching ann_ivf_topk."""
    cat = SnapshotCatalog(spark, root)
    cells_df = F.broadcast(cat.read_table("centroids"))
    assigned = cat.read_table("assignments")

    w_cell = Window.partitionBy("query_id").orderBy(F.desc("cell_cos"), "cell")
    probed = (
        queries.crossJoin(cells_df)
        .withColumn("cell_cos", _cos(F.col("qe"), F.col("centroid")))
        .withColumn("rn", F.row_number().over(w_cell))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qe", "cell")
    )
    cand = assigned.join(F.broadcast(probed), "cell").where(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "vec_id")
    return (
        cand.select(
            "query_id", "vec_id", _cos(F.col("qe"), F.col("e")).alias("cos_raw")
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "vec_id", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )
