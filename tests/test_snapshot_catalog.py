"""SnapshotCatalog unit behaviors not covered by the crawl e2e tests:
time travel by snapshot id, append-chain resolution, schema-manifest reads
of empty partitioned tables, and crash-safety of the commit protocol."""

from __future__ import annotations

import os

from news_crawler_slm_spark.sources.tables import SnapshotCatalog


def test_time_travel_and_append_chain(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "cat"))
    a1 = spark.createDataFrame([(1, "x")], "id int, v string")
    a2 = spark.createDataFrame([(2, "y")], "id int, v string")
    f1 = spark.createDataFrame([(10,)], "k int")
    f2 = spark.createDataFrame([(20,)], "k int")

    cat.commit(1, tables={"front": f1}, appends={"log": a1}, counters={"r": 1})
    cat.commit(2, tables={"front": f2}, appends={"log": a2}, counters={"r": 2})

    # current = snapshot 2: full rewrite visible, append chain unioned
    assert {r.k for r in cat.read_table("front").collect()} == {20}
    assert {r.id for r in cat.read_table("log").collect()} == {1, 2}

    # time travel to snapshot 1
    assert {r.k for r in cat.read_table("front", snapshot_id=1).collect()} == {10}
    assert {r.id for r in cat.read_table("log", snapshot_id=1).collect()} == {1}

    # lineage walks child -> parent
    assert [s.snapshot_id for s in cat.lineage()] == [2, 1]
    assert cat.snapshot(2).parent_id == 1


def test_empty_partitioned_table_reads_typed(spark, tmp_path):
    cat = SnapshotCatalog(spark, str(tmp_path / "cat2"))
    empty = spark.createDataFrame([], "bucket int, url_hash long, url string")
    cat.commit(1, tables={"state": empty}, partition_by={"state": ["bucket"]})
    got = cat.read_table("state")
    assert got.count() == 0
    assert set(got.columns) == {"bucket", "url_hash", "url"}


def test_uncommitted_manifest_is_invisible(spark, tmp_path):
    """Data written without a manifest swap must not surface (atomicity)."""
    root = str(tmp_path / "cat3")
    cat = SnapshotCatalog(spark, root)
    df = spark.createDataFrame([(1,)], "a int")
    cat.commit(1, tables={"t": df})
    # simulate a crash mid-commit-2: data dir exists, manifest/CURRENT don't
    df.write.mode("overwrite").parquet(os.path.join(root, "data", "t", "snap-2"))
    assert cat.current_snapshot_id() == 1
    assert {r.a for r in cat.read_table("t").collect()} == {1}
