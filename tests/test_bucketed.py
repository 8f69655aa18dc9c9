"""Bucketed co-located joins (sources/bucketed.py): the write-once shuffle
pays for every later join — the join plan must contain NO Exchange, and the
result must equal the plain shuffled join."""

from __future__ import annotations

from pyspark.sql import functions as F

from news_crawler_slm_spark.sources.bucketed import (
    bucketed_join_ready,
    write_bucketed,
)

SF = "/root/testdata/sf0.01"


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    try:
        assert bucketed_join_ready(spark, "b_orders", "b_lineitem")

        bo, bl = spark.table("b_orders"), spark.table("b_lineitem")
        saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                bo.join(bl, "o_orderkey")
                .groupBy("o_orderkey", "o_orderpriority")
                .agg(F.count("*").alias("n_items"), F.sum("l_quantity").alias("qty"))
            )
            rows = joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
            # the join AND the groupBy (same key prefix) ride the bucket
            # layout: no shuffle anywhere in the plan
            assert "Exchange" not in plan, plan
            assert "SortMergeJoin" in plan, plan

            want = {
                (r["o_orderkey"], r["o_orderpriority"]): (r["n_items"], r["qty"])
                for r in (
                    orders.join(
                        lineitem, orders["o_orderkey"] == lineitem["l_orderkey"]
                    )
                    .groupBy("o_orderkey", "o_orderpriority")
                    .agg(
                        F.count("*").alias("n_items"),
                        F.sum("l_quantity").alias("qty"),
                    )
                    .collect()
                )
            }
            got = {
                (r["o_orderkey"], r["o_orderpriority"]): (r["n_items"], r["qty"])
                for r in rows
            }
            assert got == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_mismatched_buckets_not_ready(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    spark.sql("DROP TABLE IF EXISTS b_a")
    spark.sql("DROP TABLE IF EXISTS b_b")
    write_bucketed(docs, "b_a", "doc_id", 4)
    write_bucketed(docs, "b_b", "doc_id", 8)
    try:
        assert not bucketed_join_ready(spark, "b_a", "b_b")
    finally:
        spark.sql("DROP TABLE IF EXISTS b_a")
        spark.sql("DROP TABLE IF EXISTS b_b")
