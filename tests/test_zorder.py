"""Z-order clustering: the Morton key must interleave bits exactly (python
twin), and a z-ordered parquet layout must tighten per-file min/max spans
on BOTH clustering columns vs a single-column sort — the property file
skipping actually uses."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from news_crawler_slm_spark.operators.zorder import (
    interleave_bits,
    with_zvalue,
    zorder_write,
)


def _twin_interleave(vals, bits):
    out = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_interleave_matches_python_twin(spark):
    rows = [(x, y) for x in (0, 1, 5, 255, 65535) for y in (0, 3, 42, 65535)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", interleave_bits([F.col("x"), F.col("y")], 16)
    )
    got = {(r.x, r.y): r.z for r in df.collect()}
    assert got == {(x, y): _twin_interleave([x, y], 16) for x, y in rows}


def _file_spans(spark, path, col):
    """Per-file normalized (max-min) span of ``col`` from parquet footer
    statistics — what data skipping reads."""
    import pyarrow.parquet as pq

    spans, lo, hi = [], None, None
    files = [
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    ]
    per_file = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        mn = min(
            _col_stat(md.row_group(i), col)[0] for i in range(md.num_row_groups)
        )
        mx = max(
            _col_stat(md.row_group(i), col)[1] for i in range(md.num_row_groups)
        )
        per_file.append((mn, mx))
        lo = mn if lo is None else min(lo, mn)
        hi = mx if hi is None else max(hi, mx)
    width = (hi - lo) or 1
    return [(mx - mn) / width for mn, mx in per_file]


def _col_stat(rg, col):
    for i in range(rg.num_columns):
        c = rg.column(i)
        if c.path_in_schema == col:
            return c.statistics.min, c.statistics.max
    raise KeyError(col)


def test_zorder_tightens_both_columns_vs_single_sort(spark, tmp_path):
    # two independent uniform dimensions — the worst case for a single sort
    n = 20000
    df = spark.range(n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(0x7FFFFFFF)) % 10000).alias("a"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(0x7FFFFFFF)) % 10000).alias(
            "b"
        ),
    )

    single = str(tmp_path / "single")
    df.repartitionByRange(16, "a").sortWithinPartitions("a").write.parquet(single)
    zpath = str(tmp_path / "zord")
    zorder_write(df, zpath, ["a", "b"], num_files=16)

    # identical content
    got = sorted((r.a, r.b) for r in spark.read.parquet(zpath).collect())
    want = sorted((r.a, r.b) for r in df.collect())
    assert got == want

    def mean(xs):
        return sum(xs) / len(xs)

    sa_single = mean(_file_spans(spark, single, "a"))
    sb_single = mean(_file_spans(spark, single, "b"))
    sa_z = mean(_file_spans(spark, zpath, "a"))
    sb_z = mean(_file_spans(spark, zpath, "b"))

    # The span PRODUCT is ~volume/files under ANY layout — what Z-order
    # buys is BALANCE: the worst dimension's span (the one a filter on
    # that column pays) drops from ~1 to ~sqrt(volume/files).
    # single sort: a is tight but b spans ~everything -> b-filters skip 0
    assert sa_single < 0.2 and sb_single > 0.9
    # z-order (16 files, 2 dims -> ~1/4 per dim + range-boundary slop):
    # both dimensions can skip most files
    assert sa_z < 0.6 and sb_z < 0.6
    assert max(sa_z, sb_z) < 0.65 < max(sa_single, sb_single)


def test_zvalue_handles_nulls_and_constants(spark):
    df = spark.createDataFrame(
        [(1, None), (2, 5), (3, 5)], "a int, b int"
    )
    out = with_zvalue(df, ["a", "b"]).collect()
    assert len(out) == 3
    assert all(r["_z"] >= 0 for r in out)
    # constant column contributes zero everywhere; null maps to the min
    zs = {r.a: r["_z"] for r in out}
    assert zs[1] == 0  # min a + null b -> all-zero key
