"""Count-min sketch (Cormode & Muthukrishnan 2005) in pure JVM column
arithmetic — the frequency member of the engine's sketch family (HLL:
cardinality, MinHash: similarity, SimHash: fingerprints, Bloom/Cuckoo:
membership; CMS: approximate counts). The motivating query at corpus
scale: "roughly how often does each of these tokens/hosts/urls occur"
against a stream or a 100 TB corpus, with O(depth x width) state instead
of a full distinct-key aggregation — and sketches from shards, rounds, or
days MERGE by cell-wise addition.

Design for determinism and scale (the HLL discipline, operators/hll.py):
- row-d hash = xxhash64(value || "#cms<d>") — a per-depth salt via string
  concat, all JVM codegen, replicated EXACTLY by the pure-python twin
  (tests/xxh64_oracle.py), so the sketch is bit-identical on any
  partitioning and any increment order;
- the sketch table is ``groupBy(row, col).count()`` over posexploded
  bucket arrays: map-side partial aggregation, shuffle cardinality at
  most depth·width rows TOTAL (not per key);
- lookups are a broadcast-items join against the sketch table, min over
  rows — no driver-side data unless the caller collects the O(d·w) table.

Guarantees: estimate >= true count always (overestimate-only); with
width w and depth d, P[error > e·N/w] <= (1/2)^d-ish (standard bound,
N = total insertions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 2048

__all__ = [
    "cms_table",
    "cms_table_by",
    "cms_lookup",
    "cms_lookup_by",
    "cms_merge",
    "DEFAULT_DEPTH",
    "DEFAULT_WIDTH",
]


def _bucket_array(col: str, depth: int, width: int) -> F.Column:
    return F.array(
        *[
            F.pmod(
                F.xxhash64(F.concat(F.col(col), F.lit(f"#cms{d}"))), F.lit(width)
            ).cast("int")
            for d in range(depth)
        ]
    )


def cms_table(
    df: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Build the sketch: (row int, col int, cnt long), one count per
    touched cell (absent cells are 0 by definition — sparse, like the HLL
    register table). One scan, one (row, col)-keyed shuffle bounded by
    depth·width distinct keys."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms_table: bad dimensions depth={depth} width={width}")
    return (
        df.select(F.posexplode(_bucket_array(col, depth, width)).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup(
    table: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point queries: for each distinct value of ``items[col]`` return the
    count-min estimate ``min over rows of cell count`` (missing cell = 0).
    The items side is the small one (the keys you are asking about) — it
    broadcasts; the sketch table is depth·width rows at most."""
    probes = items.select(col).distinct().select(
        col, F.posexplode(_bucket_array(col, depth, width)).alias("row", "col_b")
    )
    return (
        F.broadcast(probes)
        .join(
            table.withColumnRenamed("col", "col_b"),
            ["row", "col_b"],
            "left",
        )
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two sketches of the same (depth, width): cell-wise addition —
    sketch(A) + sketch(B) == sketch(A union-all B) exactly, the property
    that lets shards/rounds/days sketch independently."""
    return (
        a.unionByName(b)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_table_by(
    df: DataFrame,
    group_cols: list[str],
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Per-GROUP sketches: (group_cols..., row, col, cnt) — one count-min
    per key, e.g. token frequencies per language over a 100 TB corpus.
    Shuffle cardinality is |groups|·depth·width at most (each group's
    cells, never its key universe) with map-side partial counts — the
    grouped-HLL argument (operators/hll.py:hll_registers_by) applied to
    frequency. Cells are bit-identical to running :func:`cms_table` on
    each group's slice alone (same per-depth salted hash), so group
    sketches merge with the global algebra."""
    if depth < 1 or width < 2:
        raise ValueError(f"cms_table_by: bad dimensions depth={depth} width={width}")
    return (
        df.select(
            *group_cols,
            F.posexplode(_bucket_array(col, depth, width)).alias("row", "col"),
        )
        .groupBy(*group_cols, "row", "col")
        .agg(F.count("*").alias("cnt"))
    )


def cms_lookup_by(
    table: DataFrame,
    items: DataFrame,
    group_cols: list[str],
    col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Grouped point queries: for each distinct (group, value) in
    ``items`` return the count-min estimate within that group's sketch
    (min over rows, missing cell = 0). Probes broadcast; the sketch side
    is |groups|·depth·width rows at most."""
    probes = items.select(*group_cols, col).distinct().select(
        *group_cols,
        col,
        F.posexplode(_bucket_array(col, depth, width)).alias("row", "col_b"),
    )
    return (
        F.broadcast(probes)
        .join(
            table.withColumnRenamed("col", "col_b"),
            [*group_cols, "row", "col_b"],
            "left",
        )
        .groupBy(*group_cols, col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )
