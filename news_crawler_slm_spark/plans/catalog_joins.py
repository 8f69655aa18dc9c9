"""Join/aggregation plans over the TPC-H-ish star schema (J1-J7 analogs,
SURVEY.md §2.3) plus windowed/ordering plans over ``events`` (§2.6-2.7).

Shuffle discipline: dimension tables (region/nation/customer/supplier) are
broadcast; only fact-fact joins (orders⋈lineitem) shuffle, on their join key.
Money aggregates use the integer-cents trick (see catalog.py module doc).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .catalog import _sql_cents, _t, cents, register


@register(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum({_sql_cents('l_quantity')}) AS BIGINT) / 100.0 AS sum_qty,
           CAST(sum({_sql_cents('l_extendedprice')}) AS BIGINT) / 100.0 AS sum_base_price,
           CAST(sum({_sql_cents('l_extendedprice * (1 - l_discount)')}) AS BIGINT) / 100.0 AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan-heavy partial+final agg; the filter and the
    4-column projection must push into the parquet scan (checked in
    tests/test_plans.py)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
            (F.sum(cents(F.col("l_extendedprice"))) / 100.0).alias("sum_base_price"),
            (
                F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0
            ).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    f"""
    SELECT o.o_orderkey AS orderkey,
           CAST(sum({_sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS BIGINT) / 100.0 AS revenue,
           o.o_orderdate AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, orderdate, orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: selective dim filter broadcast into a fact-fact join;
    top-10 with a total deterministic ORDER BY (revenue, orderdate, key)."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_orderkey").alias("orderkey"), F.col("o_orderdate").alias("orderdate"))
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name AS nation,
           CAST(sum({_sql_cents('l.l_extendedprice * (1 - l.l_discount)')}) AS BIGINT) / 100.0 AS revenue
    FROM region r JOIN nation n   ON n.n_regionkey = r.r_regionkey
                  JOIN customer c ON c.c_nationkey = n.n_nationkey
                  JOIN orders o   ON o.o_custkey = c.c_custkey
                  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                  JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join — all dims broadcast, single fact-fact
    shuffle on orderkey; Catalyst/AQE pick the join order."""
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))) / 100.0
            ).alias("revenue")
        )
    )


@register(
    "orders_without_lineitems",
    """
    SELECT o.o_orderkey AS orderkey FROM orders o
    WHERE o.o_orderstatus = 'F'
      AND NOT EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
    """,
)
def orders_without_lineitems(spark, sf_dir):
    """J3/P6 analog — LEFT ANTI JOIN (the engine's replacement for every
    "not in python-set" filter in the reference, step_05:50-52)."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_quantity") > 45).select("l_orderkey").distinct()
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        F.col("o_orderkey").alias("orderkey")
    )


@register(
    "top_customers_per_nation",
    """
    SELECT nation, custkey, acctbal FROM (
      SELECT n.n_name AS nation, c.c_custkey AS custkey, c.c_acctbal AS acctbal,
             row_number() OVER (PARTITION BY n.n_name
                                ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn <= 3
    """,
)
def top_customers_per_nation(spark, sf_dir):
    """W2/W5 shape — per-group top-k via window with deterministic tiebreak;
    Catalyst rewrites the rank-filter into per-partition top-k."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    w = Window.partitionBy("nation").orderBy(F.desc("acctbal"), "custkey")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("c_custkey").alias("custkey"),
            F.col("c_acctbal").alias("acctbal"),
        )
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("nation", "custkey", "acctbal")
    )


@register(
    "hourly_event_counts",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
           round(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
                 / (100.0 * count(*)), 6) AS mean_value
    FROM events GROUP BY 1, 2
    """,
)
def hourly_event_counts(spark, sf_dir):
    """Tumbling-window aggregation (batch twin of the Structured-Streaming
    windowed agg; §2.9) — date_trunc bucketing, partial+final agg.

    ``value`` carries exact cents, so the mean goes through the integer-
    cents sum (order-independent) instead of ``avg(double)``: with ~3600
    groups at sf0.1, one group's float avg landed within 1e-12 of a
    round-6 half-ulp boundary and summation order flipped the last digit
    between engines.  Exact integer sum → one identical division+round on
    both sides → bit-identical at every scale."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(cents(F.col("value"))).cast("double")
                / (F.lit(100.0) * F.count("*")),
                6,
            ).alias("mean_value"),
        )
    )


@register(
    "events_asof_join",
    """
    SELECT c.user_id, c.event_id, c.ts AS click_ts, v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND v.ts <= c.ts
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join (engine addition; the temporal primitive Spark lacks as
    a built-in): each click joined to the most recent view at-or-before it
    for the same user.  Expressed as a composition of existing operators —
    tag both sides, union, and carry ``last(view_ts, ignoreNulls)`` over a
    (user, ts)-ordered window — ONE shuffle on user_id, no per-row Python,
    no range-explosion join.  At equal timestamps the view sorts before
    the click (side_ord), matching the oracle's inclusive ``v.ts <= c.ts``.
    The DuckDB twin is its NATIVE ASOF JOIN — an independent
    implementation of the same semantics.
    """
    e = _t(spark, sf_dir, "events")
    clicks = e.where(F.col("event_type") == "click")
    views = e.where(F.col("event_type") == "view")
    u = clicks.select(
        "user_id",
        "event_id",
        "ts",
        F.lit(1).alias("side_ord"),
        F.lit(None).cast("timestamp").alias("vts"),
    ).unionByName(
        views.select(
            "user_id",
            "event_id",
            "ts",
            F.lit(0).alias("side_ord"),
            F.col("ts").alias("vts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side_ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("last_view_ts", F.last("vts", ignorenulls=True).over(w))
        .where(F.col("side_ord") == 1)
        .select(
            "user_id", "event_id", F.col("ts").alias("click_ts"), "last_view_ts"
        )
    )


@register(
    "skewed_hot_key_join",
    """
    WITH l AS (
      SELECT CASE WHEN l_orderkey % 4 = 0 THEN 0 ELSE l_orderkey END AS k,
             l_quantity
      FROM lineitem
    )
    SELECT coalesce(o.o_orderpriority, '<hot-unmatched>') AS priority,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
             / 100.0 AS sum_qty
    FROM l LEFT JOIN orders o ON o.o_orderkey = l.k
    GROUP BY 1
    """,
)
def skewed_hot_key_join(spark, sf_dir):
    """Deliberately skewed fact-fact join — the hot-key evidence query.

    A quarter of lineitem rows are folded onto one hot join key (0, which
    matches nothing in orders — a LEFT join keeps them), so one shuffle
    partition carries ~25% of the fact table: the frontier's hot-host
    problem in join form.  Correctness is partition-layout-independent
    (checked vs the oracle); the SCALE story is AQE skew-join — with
    adaptive execution on, the oversized partition is split into
    advisory-sized sub-partitions at runtime (plan shows
    ``SortMergeJoin(skew=true)``), which
    tests/test_plans.py::test_skew_join_aqe_splits_hot_partition asserts
    under production-shaped thresholds.  Unlike the salting the frontier
    uses (explicit key decomposition when the hot key must stay one
    group), a join tolerates runtime splitting because each probe row
    joins independently — AQE is the right tool here, salting there.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 4 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        "l_quantity",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(o, li["k"] == o["o_orderkey"], "left")
        .groupBy(
            F.coalesce("o_orderpriority", F.lit("<hot-unmatched>")).alias("priority")
        )
        .agg(
            F.count("*").alias("n_items"),
            (F.sum(cents(F.col("l_quantity"))) / 100.0).alias("sum_qty"),
        )
    )


@register(
    "sessionization",
    """
    WITH gaps AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
             THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id, count(*) AS n_events,
           CAST(sum(new_session) AS BIGINT) AS n_sessions
    FROM gaps GROUP BY user_id
    """,
)
def sessionization(spark, sf_dir):
    """Gap-based sessionization via lag() (the batch twin of
    applyInPandasWithState session windows): a new session starts after a
    >30 min silence per user."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_ts = F.lag("ts").over(w)
    new_s = F.when(
        lag_ts.isNull() | (F.col("ts") > lag_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        e.select("user_id", new_s.alias("new_session"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("new_session").cast("long").alias("n_sessions"))
    )


@register(
    "events_running_rank",
    """
    SELECT event_id, user_id, value FROM (
      SELECT event_id, user_id, value,
             rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS r
      FROM events WHERE event_type = 'purchase'
    ) WHERE r = 1
    """,
)
def events_running_rank(spark, sf_dir):
    """W3 — max-with-ties per group via rank()==1 (get_max_tokens.py:30-38)."""
    e = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.select("event_id", "user_id", "value", F.rank().over(w).alias("r"))
        .where(F.col("r") == 1)
        .select("event_id", "user_id", "value")
    )


_SLIDING_ORACLE = """
    WITH w AS (
      SELECT event_type, ts,
             unnest(list_transform(range(0, 2), i ->
                time_bucket(INTERVAL '30 minutes', ts)
                  - i * INTERVAL '30 minutes')) AS ws
      FROM events
    )
    SELECT ws AS window_start,
           ws + INTERVAL '60 minutes' AS window_end,
           event_type,
           count(*) AS n
    FROM w
    WHERE ts >= ws AND ts < ws + INTERVAL '60 minutes'
    GROUP BY 1, 2, 3
"""


@register("events_sliding_counts", _SLIDING_ORACLE)
def events_sliding_counts(spark, sf_dir):
    """Sliding-window event counts (1 h window / 30 min slide) — the BATCH
    form of the streaming trending primitive (streaming/ingest.py:
    sliding_token_counts), oracle-pinned: Spark's F.window(slide) places
    each event in window/slide = 2 overlapping windows aligned to the
    epoch, and the oracle reconstructs exactly those windows via
    time_bucket (same epoch alignment) minus i x slide. A hash-identical
    result proves the two engines agree on window placement — the
    semantics every watermarked sliding aggregation in the engine relies
    on.

    Plan shape: F.window(slide) expands each row to its two windows
    INSIDE the scan projection (a 2x explode, the unavoidable cost of
    sliding windows) and aggregates on (window, type) with map-side
    partials — no join, no second scan.
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
