"""Join, window/top-k and event lanes (SURVEY §2.3, §2.5, §2.8, §2.9)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

# ---------------------------------------------------------------------------
# Joins (SURVEY §2.3) + windows/top-k (§2.5, §2.6) + set ops (§2.7)
# ---------------------------------------------------------------------------

@register(
    "broadcast_join_revenue",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    headline=True,
)
def broadcast_join_revenue(spark, sf_dir):
    """Fact⋈dim with explicit broadcast of the dimension (parity with the
    reference's broadcast-join usage, ClassBalancer.scala:89-96). At
    100 TB the part dim stays broadcastable; no shuffle of lineitem."""
    li, part = _t(spark, sf_dir, "lineitem"), _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_multi",
    oracle="""
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(DISTINCT o_orderkey) AS n_orders
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderpriority
    """,
)
def join_multi(spark, sf_dir):
    """3-way join (TPC-H Q3 shape): broadcast the filtered customer dim,
    shuffle-join orders⋈lineitem on the common key."""
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4)
            .alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
def semi_join(spark, sf_dir):
    """left_semi join (EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def anti_join(spark, sf_dir):
    """left_anti join (NOT EXISTS) — the dedup/complement primitive.
    Anti-joins against the urgent-order subset so the result is
    non-empty at every test SF (a vacuous 0-row match proves
    nothing)."""
    cust = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return cust.join(urgent, cust.c_custkey == urgent.o_custkey,
                     "left_anti").select("c_custkey", "c_mktsegment")


@register(
    "top_k_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
)
def top_k_per_group(spark, sf_dir):
    """Window top-k per group — the engine's replacement for the
    reference's collect-and-sort-in-UDF top-k patterns (SURVEY §2.6);
    deterministic tiebreak on the key."""
    orders = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS "O",
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS "F"
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark, sf_dir):
    """Pivot (explicit value list → no extra distinct-values job)."""
    li = _t(spark, sf_dir, "lineitem")
    out = li.groupBy("l_returnflag").pivot("l_linestatus", ["O", "F"]).agg(
        F.round(F.sum("l_quantity"), 4)
    )
    return out


@register(
    "rollup_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_counts(spark, sf_dir):
    """Hierarchical rollup aggregation (free via Catalyst — SURVEY §2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("sum_qty")
    )


# ---------------------------------------------------------------------------
# Events: sessionization, windowed aggs, JSON (SURVEY §2.5, §2.8, §2.9)
# ---------------------------------------------------------------------------

@register(
    "sessionize",
    oracle="""
    SELECT user_id, event_id,
           CAST(sum(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS BIGINT) AS session_id
    FROM (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL THEN 1
                  WHEN epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id)) > 1800000000 THEN 1
                  ELSE 0 END AS new_s
      FROM events
    )
    """,
    headline=True,
)
def sessionize(spark, sf_dir):
    """Sessionization: 30-min inactivity gap → new session. Windowed
    lag+cumsum, shuffles once on user_id (scales: state per user is a
    running counter, no driver involvement)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_s = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    return (
        ev.withColumn("__new", new_s)
        .withColumn("session_id", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
        .select("user_id", "event_id", "session_id")
    )


@register(
    "window_hourly_agg",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type, count(*) AS n, round(sum(value), 4) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def window_hourly_agg(spark, sf_dir):
    """Tumbling-window aggregation (batch analog of the streaming
    F.window path; SURVEY §2.9)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
            .alias("hour_start"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_extract(spark, sf_dir):
    """JSON scalar extraction (parity: io/http/Parsers.scala from_json
    usage; SURVEY §2.8) — stays in Catalyst's JSON path."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("sum_k"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
