"""Relational / dataflow lanes: TPC-H, projections, summaries (SURVEY §2.2, §2.4, §2.6, §2.7)

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
# Relational / dataflow stages (SURVEY §2.2, §2.6, §2.7)
# ---------------------------------------------------------------------------

@register(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                       AS sum_qty,
           round(sum(l_extendedprice), 4)                                  AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)               AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           round(avg(l_quantity), 6)                                       AS avg_qty,
           round(avg(l_extendedprice), 6)                                  AS avg_price,
           round(avg(l_discount), 6)                                       AS avg_disc,
           count(*)                                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    headline=True,
)
def tpch_q1(spark, sf_dir):
    """Flagship scan→filter→groupBy→agg. Catalyst pushes the shipdate
    filter into the parquet scan; partial aggregation runs map-side so
    the shuffle carries one row per (flag,status) per task."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """)
def tpch_q3(spark, sf_dir):
    """Shipping-priority shape (TPC-H Q3): selective dimension filters
    on both sides of a 3-way join, then agg + global top-k. Catalyst
    pushes all three filters into the scans; the customer side is
    broadcast-sized after its segment filter; the LIMIT after ORDER BY
    is a TakeOrderedAndProject — no full sort materializes."""
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10))


@register(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """)
def tpch_q6(spark, sf_dir):
    """Forecast-revenue shape (TPC-H Q6): pure filter+agg, the
    pushdown showcase — every predicate reaches PushedFilters, the
    scan prunes to 4 columns, and the aggregate is one map-side
    partial per task."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01 00:00:00")
             .cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01 00:00:00")
               .cast("timestamp"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")),
                     4).alias("revenue"),
             F.count("*").alias("n")))


@register(
    "tpch_q18",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice,
           round(sum(l_quantity), 4) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """)
def tpch_q18(spark, sf_dir):
    """Large-volume-customer shape (TPC-H Q18): a HAVING subquery as a
    semi-join. The qualifying-orders aggregate is tiny (orders over
    the quantity threshold), so it broadcasts into the fact join
    instead of shuffling lineitem twice."""
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__q"))
           .filter(F.col("__q") > 150)
           .select("l_orderkey"))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big),
                    orders.o_orderkey == big.l_orderkey, "left_semi")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20))


@register(
    "tpch_q5",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """)
def tpch_q5(spark, sf_dir):
    """Local-supplier-volume shape (TPC-H Q5): the 6-way snowflake
    join. region→nation→supplier is a broadcast chain (dims are tiny
    at every sf), the customer⋈orders⋈lineitem spine shuffles on its
    keys once, and the local-supplier condition
    (c_nationkey = s_nationkey) rides the supplier join rather than
    becoming a post-join filter. Dates shifted into the testdata's
    1995-2001 span (TPC-H's 1994 window matches zero rows here)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(supp),
              (li.l_suppkey == supp.s_suppkey)
              & (cust.c_nationkey == supp.s_nationkey))
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            4).alias("revenue")))


@register(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_5' AND n2.n_name = 'NATION_7')
          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_5'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """)
def tpch_q7(spark, sf_dir):
    """Volume-shipping shape (TPC-H Q7): the same dimension table
    (nation) joined twice under different roles with a disjunctive
    cross-role predicate. Both nation joins broadcast; the disjunction
    stays a join-level filter so Catalyst can still prune lineitem by
    shipdate at the scan."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp")))
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    joined = (
        supp.join(li, supp.s_suppkey == li.l_suppkey)
        .join(orders, F.col("o_orderkey") == li.l_orderkey)
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_5") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_5"))))
    return (
        joined.select(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 4).alias("revenue")))


@register(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           round(c_acctbal, 4) AS acctbal, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """)
def tpch_q10(spark, sf_dir):
    """Returned-item-reporting shape (TPC-H Q10): quarter-windowed
    fact join, per-customer revenue agg, global top-20. The returnflag
    and orderdate predicates both reach PushedFilters; the top-20 is a
    TakeOrderedAndProject with c_custkey as the deterministic
    tie-break (TPC-H orders by revenue alone, which is
    nondeterministic under ties — the driver hash gate needs total
    order)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))),
            4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue",
                F.round("c_acctbal", 4).alias("acctbal"), "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20))


@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """)
def tpch_q13(spark, sf_dir):
    """Customer-distribution shape (TPC-H Q13): outer join with a
    join-level (not WHERE-level) predicate, then a double aggregation
    — count per customer, then histogram of counts. The outer join's
    ON-clause filter must NOT push to a WHERE (that would drop
    order-less customers); count(o_orderkey) counts non-null keys so
    they land in the c_count=0 bucket."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count")))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "tpch_q14",
    oracle="""
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
            / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """)
def tpch_q14(spark, sf_dir):
    """Promotion-effect shape (TPC-H Q14): conditional aggregation
    over a fact⋈dim join — one month of lineitem joins part (broadcast
    after AQE sees the filtered fact side), and the CASE rides the
    aggregate so promo and total are one pass."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(100.0 * F.sum(promo) / F.sum(rev), 6)
             .alias("promo_revenue")))


@register(
    "tpch_q17",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23'
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = part.p_partkey)
    """)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order shape (TPC-H Q17): a correlated scalar
    subquery (per-part average quantity) decorrelated into a
    groupBy + join. The averages are computed only over the branded
    parts (a broadcast semi-join gates the agg input — the subquery
    is correlated on a key already constrained to the brand), so the
    joined-back frame is O(branded parts), small enough to broadcast
    at any sf instead of re-scanning lineitem per part the way the
    correlated form reads."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    per_part_avg = (
        li.join(F.broadcast(part.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey")
        .agg((0.2 * F.avg("l_quantity")).alias("__qbar"))
        .withColumnRenamed("l_partkey", "__pk"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part_avg), li.l_partkey == F.col("__pk"))
        .filter(F.col("l_quantity") < F.col("__qbar"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly")))


@register(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS nation
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'AMERICA'
        AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
        AND p_type = 'ECONOMY'
    ) GROUP BY o_year
    """)
def tpch_q8(spark, sf_dir):
    """National-market-share shape (TPC-H Q8): the widest join in the
    suite — 7 joins, nation twice under different roles, a conditional
    share ratio on top. Every dimension broadcasts; lineitem flows
    through one spine shuffle; the CASE/sum ratio computes both
    numerator and denominator in a single aggregation pass."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31 00:00:00").cast("timestamp")))
    cust = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_regionkey").alias("n1_region"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key")))
    return (joined
            .select(F.year("o_orderdate").cast("int").alias("o_year"),
                    vol.alias("volume"), "nation")
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("nation") == "NATION_3",
                             F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"), 6).alias("mkt_share")))


@register(
    "tpch_q15",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """)
def tpch_q15(spark, sf_dir):
    """Top-supplier shape (TPC-H Q15, view form): a quarter's revenue
    per supplier, then keep the max — the max is a one-row aggregate
    broadcast back over the (supplier-sized, already-reduced) revenue
    frame, so lineitem scans once and nothing re-runs per supplier.
    Revenue is rounded BEFORE the max compare on both sides: equality
    on an unrounded float aggregate would be engine-dependent."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp")))
    rev = (li.groupBy("l_suppkey")
           .agg(F.round(F.sum(
               F.col("l_extendedprice") * (1 - F.col("l_discount"))),
               4).alias("total_revenue")))
    from mmlspark_spark.core.cache import attach_intermediates, persist_intermediate

    rev = persist_intermediate(rev)  # consumed by max AND the join
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier")
    out = (rev.crossJoin(F.broadcast(mx))
           .filter(F.col("total_revenue") == F.col("__mx"))
           .join(F.broadcast(supp),
                 F.col("l_suppkey") == F.col("s_suppkey"))
           .select("s_suppkey", "s_name", "total_revenue"))
    return attach_intermediates(out, rev)


@register(
    "tpch_q22",
    oracle="""
    WITH ab AS (
      SELECT round(avg(c_acctbal), 6) AS v FROM customer WHERE c_acctbal > 0
    )
    SELECT n_name, count(*) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT v FROM ab)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY n_name
    """)
def tpch_q22(spark, sf_dir):
    """Global-sales-opportunity shape (TPC-H Q22 adapted to this
    schema: the phone-prefix filter becomes a recent-order window —
    same plan skeleton): scalar-subquery threshold + NOT EXISTS
    anti-join + per-nation rollup. The average broadcasts as a one-row
    frame; the anti-join probes only the date-filtered orders slice;
    both engines round the threshold to 6dp so the boundary compare
    cannot flip on float summation order."""
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp"))
    ab = (cust.filter(F.col("c_acctbal") > 0)
          .agg(F.round(F.avg("c_acctbal"), 6).alias("__ab")))
    return (
        cust.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("__ab"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("numcust"),
             F.round(F.sum("c_acctbal"), 4).alias("totacctbal")))


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             round(avg(l_extendedprice / l_quantity), 4) AS ps_supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand, ps_supplycost
    FROM ps
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
      AND ps_supplycost = (
        SELECT min(ps2.ps_supplycost) FROM ps ps2
        JOIN supplier s2 ON s2.s_suppkey = ps2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = ps.l_partkey AND r2.r_name = 'EUROPE')
    ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 20
    """)
def tpch_q2(spark, sf_dir):
    """Minimum-cost-supplier shape (TPC-H Q2, adapted: this schema has
    no partsupp table, so the part-supplier cost relation is derived
    from lineitem — unit price per (part, supplier) — which preserves
    the plan skeleton exactly: correlated per-part MIN subquery over a
    region-restricted supplier set, decorrelated into a groupBy + join
    back on (part, cost)). The derived relation shuffles lineitem ONCE
    and is persisted for its two consumers (per-part min + final
    attach); supplier/nation/region and the size/type-filtered part
    side all broadcast. Cost is rounded to 4dp on both engines BEFORE
    the min-equality compare, so the join condition cannot flip on
    float representation."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
    )

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD"))
    # suppliers in the region: 3 broadcast joins collapse to one tiny frame
    eu_supp = (supp.join(F.broadcast(nat),
                         supp.s_nationkey == nat.n_nationkey)
               .join(F.broadcast(reg),
                     nat.n_regionkey == reg.r_regionkey)
               .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")),
                       4).alias("ps_supplycost")))
    ps_eu = persist_intermediate(
        ps.join(F.broadcast(eu_supp),
                F.col("l_suppkey") == F.col("s_suppkey")))
    min_cost = (ps_eu.groupBy(F.col("l_partkey").alias("__mpk"))
                .agg(F.min("ps_supplycost").alias("__mc")))
    out = (ps_eu
           .join(F.broadcast(min_cost),
                 (F.col("l_partkey") == F.col("__mpk"))
                 & (F.col("ps_supplycost") == F.col("__mc")))
           .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
           .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
                   "ps_supplycost")
           .orderBy(F.col("s_acctbal").desc(), "s_name", "p_partkey")
           .limit(20))
    return attach_intermediates(out, ps_eu)


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
def tpch_q4(spark, sf_dir):
    """Order-priority-checking shape (TPC-H Q4, adapted: no
    commit/receipt dates in this schema, so "late" is shipped >90 days
    after the order date — same EXISTS skeleton). The correlated
    EXISTS becomes a LEFT SEMI hash join on orderkey with the lateness
    predicate as the join residual: lineitem is scanned once, never
    re-probed per order, and the quarter filter on orders pushes to
    the scan before the shuffle."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp")))
    li = _t(spark, sf_dir, "lineitem")
    return (orders.join(
                li,
                (orders.o_orderkey == li.l_orderkey)
                & (li.l_shipdate
                   > orders.o_orderdate + F.expr("INTERVAL 90 DAY")),
                "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


@register(
    "tpch_q9",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           round(sum(l_extendedprice * (1 - l_discount)
                     - 0.1 * p_retailprice * l_quantity), 4) AS sum_profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, o_year ORDER BY n_name, o_year DESC
    """)
def tpch_q9(spark, sf_dir):
    """Product-type-profit shape (TPC-H Q9, adapted: supply cost is
    10% of p_retailprice — this schema has no partsupp — keeping the
    profit expression's join-of-five structure intact). The name
    filter prunes part to ~1/8 before its broadcast; supplier and
    nation broadcast; lineitem flows through a single spine shuffle
    to orders; profit aggregates by (nation, year) in one pass with
    map-side partials."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    nat = _t(spark, sf_dir, "nation")
    profit = (F.col("l_extendedprice") * (1 - F.col("l_discount"))
              - 0.1 * F.col("p_retailprice") * F.col("l_quantity"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .select(F.col("n_name").alias("nation"),
                    F.year("o_orderdate").cast("int").alias("o_year"),
                    profit.alias("__p"))
            .groupBy("nation", "o_year")
            .agg(F.round(F.sum("__p"), 4).alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


@register(
    "tpch_q11",
    oracle="""
    WITH val AS (
      SELECT l_partkey, round(sum(l_extendedprice), 4) AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT l_partkey AS p_partkey, part_value
    FROM val
    WHERE part_value > (SELECT round(avg(part_value) * 3, 4) FROM val)
    ORDER BY part_value DESC, p_partkey
    """)
def tpch_q11(spark, sf_dir):
    """Important-stock shape (TPC-H Q11, adapted: part value is the
    lineitem revenue supplied by one nation's suppliers — no partsupp
    availqty here — same HAVING-against-scalar-subquery skeleton).
    The nation-filtered supplier set broadcasts as a semi-join gate
    before the groupBy, so only that nation's lineitem slice shuffles;
    the per-part value frame is persisted for its two consumers (the
    threshold aggregate and the filter), and the one-row threshold
    broadcasts back. The cut is AVERAGE-relative (3x mean part value),
    not total-fraction-relative like the literal TPC-H text: a
    fraction-of-total threshold divides by the part COUNT, so the
    same query silently returns nothing at 10x scale (measured: 40
    rows at sf0.01, 0 at sf0.1) — mean-relative selects 'important
    stock' at every scale (NATION_3 has suppliers at every test SF,
    so even the sf0.001 local oracle check exercises the threshold —
    a nation empty at test scale would compare empty-vs-empty and
    verify nothing). Both engines round value AND threshold to
    4dp so the strict > cannot flip on float summation order."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
    )

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    nat_supp = (supp.join(F.broadcast(nat),
                          supp.s_nationkey == nat.n_nationkey)
                .select("s_suppkey"))
    val = persist_intermediate(
        li.join(F.broadcast(nat_supp),
                li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.round(F.sum("l_extendedprice"), 4).alias("part_value")))
    total = val.agg(
        F.round(F.avg("part_value") * 3, 4).alias("__thr"))
    out = (val.crossJoin(F.broadcast(total))
           .filter(F.col("part_value") > F.col("__thr"))
           .select(F.col("l_partkey").alias("p_partkey"), "part_value")
           .orderBy(F.col("part_value").desc(), "p_partkey"))
    return attach_intermediates(out, val)


@register(
    "tpch_q12",
    oracle="""
    SELECT CASE WHEN l_shipdate <= o_orderdate + INTERVAL 30 DAY
                THEN 'FAST' ELSE 'SLOW' END AS ship_mode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY ship_mode ORDER BY ship_mode
    """)
def tpch_q12(spark, sf_dir):
    """Shipping-mode/priority shape (TPC-H Q12, adapted: no
    l_shipmode column, so the mode is the observed shipping speed —
    ≤30 days = FAST — same join + dual-CASE-count pivot skeleton).
    The year filter pushes to the lineitem scan; one shuffle joins
    orders; both priority counts compute in a single aggregation pass
    (no second scan, no pivot shuffle)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    orders = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                F.when(F.col("l_shipdate")
                       <= F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"),
                       "FAST").otherwise("SLOW").alias("ship_mode"),
                F.when(high, 1).otherwise(0).alias("__hi"),
                F.when(~high, 1).otherwise(0).alias("__lo"))
            .groupBy("ship_mode")
            .agg(F.sum("__hi").alias("high_line_count"),
                 F.sum("__lo").alias("low_line_count"))
            .orderBy("ship_mode"))


@register(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 20
    """)
def tpch_q16(spark, sf_dir):
    """Parts/supplier-relationship shape (TPC-H Q16, adapted: the
    supplier relation comes from lineitem and "complaint" suppliers
    are those with negative account balance — same NOT IN + distinct
    count skeleton). The NOT IN subquery is safe to rewrite as a
    broadcast LEFT ANTI join because both key columns are
    non-nullable here (the general NOT-IN-with-NULLs trap is
    documented); the brand/size-filtered part side broadcasts; the
    exact distinct count shuffles on the (brand, type, size) group
    key with the suppkey carried for the distinct."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    bad_supp = (_t(spark, sf_dir, "supplier")
                .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(bad_supp),
                  li.l_suppkey == F.col("s_suppkey"), "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(),
                     "p_brand", "p_type", "p_size")
            .limit(20))


@register(
    "tpch_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 30)
    """)
def tpch_q19(spark, sf_dir):
    """Discounted-revenue shape (TPC-H Q19: disjunctive multi-branch
    predicate over a part join; container/shipmode columns absent, so
    the branches predicate on brand/size/quantity). The part side is
    pre-filtered to the UNION of the three brands (that conjunct
    factors out of the OR and prunes the broadcast build side ~8x);
    the full disjunction stays as the join residual. One broadcast
    join, one scalar aggregate, no shuffle of lineitem at all."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#3"))
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & qty.between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(10, 30)
           & qty.between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & qty.between(20, 30)))
    return (li.join(F.broadcast(part),
                    (li.l_partkey == part.p_partkey) & cond)
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                4).alias("revenue")))


@register(
    "tpch_q20",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part
                          WHERE p_name LIKE 'red%')
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 50)
    ORDER BY s_name
    """)
def tpch_q20(spark, sf_dir):
    """Part-promotion shape (TPC-H Q20: two nested IN subqueries with
    a HAVING threshold; availqty is absent, so "excess" is >50 units
    of one red part shipped by one supplier in the year). Inner IN →
    broadcast LEFT SEMI on the name-filtered part keys; the
    grouped-HAVING result reduces to a distinct suppkey set that
    SEMI-gates the (tiny) supplier table; nation broadcasts for the
    name. Every probe is a semi join — no row multiplication
    anywhere."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp")))
    red_parts = (_t(spark, sf_dir, "part")
                 .filter(F.col("p_name").like("red%")).select("p_partkey"))
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    qualifying = (
        li.join(F.broadcast(red_parts),
                li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 50)
        .select("l_suppkey").distinct())
    return (supp.join(F.broadcast(qualifying),
                      supp.s_suppkey == F.col("l_suppkey"), "left_semi")
            .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
            .select("s_suppkey", "s_name", "n_name")
            .orderBy("s_name"))


@register(
    "tpch_q21",
    oracle="""
    WITH lo AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END AS late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE o_orderstatus = 'F'),
    od AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late = 1 THEN l_suppkey END) AS n_late
      FROM lo GROUP BY l_orderkey)
    SELECT s_name, count(*) AS numwait
    FROM lo JOIN od USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE lo.late = 1 AND od.n_supp > 1 AND od.n_late = 1
    GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20
    """)
def tpch_q21(spark, sf_dir):
    """Suppliers-who-kept-orders-waiting shape (TPC-H Q21: EXISTS
    another supplier in the order + NOT EXISTS another LATE supplier,
    adapted to shipped->90-days lateness). Both correlated quantifiers
    decorrelate into ONE per-order aggregate — n_supp > 1 is the
    EXISTS, n_late = 1 (only this supplier) is the NOT EXISTS — so
    lineitem⋈orders computes once, is persisted for its two consumers
    (the order-level aggregate and the row-level filter), and the
    whole query costs two shuffles on the same orderkey instead of
    the four correlated re-scans the literal form describes."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
    )

    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    lo = persist_intermediate(
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey",
                F.when(F.col("l_shipdate")
                       > F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"),
                       1).otherwise(0).alias("late")))
    # two-level aggregate instead of two countDistincts in one agg:
    # the distinct-pair level replaces the EXPAND x2 row duplication
    # with a partial-aggregating shuffle on (orderkey, suppkey), and
    # the order level then counts pairs / sums the per-pair late flag
    # — identical counts (l_suppkey is never NULL in this schema; the
    # oracle hash-gates it) with no Expand node in the plan (r16
    # SummarizeData pattern, guide §2.3 "aggregate before you
    # shuffle").
    per_pair = (lo.groupBy("l_orderkey", "l_suppkey")
                .agg(F.max("late").alias("__has_late")))
    od = (per_pair.groupBy(F.col("l_orderkey").alias("__ok"))
          .agg(F.count("*").alias("n_supp"),
               F.sum("__has_late").alias("n_late")))
    out = (lo.join(od, lo.l_orderkey == F.col("__ok"))
           .filter((F.col("late") == 1) & (F.col("n_supp") > 1)
                   & (F.col("n_late") == 1))
           .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
           .groupBy("s_name")
           .agg(F.count("*").alias("numwait"))
           .orderBy(F.col("numwait").desc(), "s_name")
           .limit(20))
    return attach_intermediates(out, lo)


def _z_terms(col: str, dims: int, off: int, bits: int) -> str:
    """DuckDB-side Morton interleave of `col`'s low bits — mirrors
    operators/scale.py:zorder_key term by term."""
    return " + ".join(
        f"((({col} >> {i}) & 1) << {i * dims + off})" for i in range(bits))


@register(
    "zorder_key",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {_z_terms('(l_orderkey % 1024)', 2, 0, 10)}
           + {_z_terms('(l_partkey % 1024)', 2, 1, 10)} AS zkey
    FROM lineitem
    """)
def zorder_key_q(spark, sf_dir):
    """Morton (Z-order) key over two dimensions — the data-skipping
    layout primitive (Delta/Iceberg OPTIMIZE ZORDER): files sorted by
    this key are hyper-rectangles in (orderkey, partkey) space, so
    parquet footer min/max stats prune scans for predicates on either
    dimension. Pure shift/mask integer arithmetic, map-only, verified
    bit-exact cross-engine. ZOrderRepartitioner layers min/max range
    scaling + repartitionByRange on top (locality-tested in tests/)."""
    from mmlspark_spark.operators.scale import zorder_key

    li = _t(spark, sf_dir, "lineitem")
    z = zorder_key([F.col("l_orderkey") % 1024,
                    F.col("l_partkey") % 1024], bits=10)
    return li.select("l_orderkey", "l_linenumber", z.alias("zkey"))


@register(
    "select_project",
    oracle="""
    SELECT l_orderkey, l_extendedprice, l_discount
    FROM lineitem WHERE l_discount > 0.05
    """,
)
def select_project(spark, sf_dir):
    """SelectColumns stage → projection + filter pushed to the scan
    (parity: stages/SelectColumns.scala)."""
    from mmlspark_spark.operators import SelectColumns

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.05)
    return SelectColumns(cols=["l_orderkey", "l_extendedprice", "l_discount"]).transform(li)


@register(
    "drop_rename",
    oracle="""
    SELECT l_orderkey AS order_key, l_linenumber, l_quantity
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def drop_rename(spark, sf_dir):
    """DropColumns + RenameColumn stages (parity: stages/DropColumns.scala,
    stages/RenameColumn.scala)."""
    from mmlspark_spark.operators import DropColumns, RenameColumn, SelectColumns

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    out = SelectColumns(cols=["l_orderkey", "l_linenumber", "l_quantity"]).transform(li)
    out = RenameColumn(inputCol="l_orderkey", outputCol="order_key").transform(out)
    return DropColumns(cols=[]).transform(out)


@register(
    "explode_tokens",
    oracle="""
    SELECT doc_id, word FROM (
      SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS word
      FROM documents
    ) WHERE word <> ''
    """,
)
def explode_tokens(spark, sf_dir):
    """Explode stage over tokenized documents (parity: stages/Explode.scala)."""
    from mmlspark_spark.functions import tokens
    from mmlspark_spark.operators import Explode

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    out = Explode(inputCol="toks", outputCol="word").transform(docs)
    return out.select("doc_id", "word")


@register(
    "summarize_data",
    oracle="""
    WITH src AS (SELECT l_quantity, l_extendedprice, l_discount, l_tax FROM lineitem)
    SELECT * FROM (
      SELECT 'l_quantity' AS feature,
             CAST(count(*) AS DOUBLE) AS count,
             CAST(count(DISTINCT l_quantity) AS DOUBLE) AS unique_value_count,
             CAST(count(*) - count(l_quantity) AS DOUBLE) AS missing_value_count,
             round(avg(l_quantity), 6) AS mean, round(stddev_samp(l_quantity), 6) AS stddev,
             round(min(l_quantity), 6) AS min, round(max(l_quantity), 6) AS max,
             round(quantile_cont(l_quantity, 0.25), 6) AS p25,
             round(quantile_cont(l_quantity, 0.5), 6) AS median,
             round(quantile_cont(l_quantity, 0.75), 6) AS p75
      FROM src
      UNION ALL
      SELECT 'l_extendedprice', CAST(count(*) AS DOUBLE),
             CAST(count(DISTINCT l_extendedprice) AS DOUBLE),
             CAST(count(*) - count(l_extendedprice) AS DOUBLE),
             round(avg(l_extendedprice), 6), round(stddev_samp(l_extendedprice), 6),
             round(min(l_extendedprice), 6), round(max(l_extendedprice), 6),
             round(quantile_cont(l_extendedprice, 0.25), 6),
             round(quantile_cont(l_extendedprice, 0.5), 6),
             round(quantile_cont(l_extendedprice, 0.75), 6)
      FROM src
      UNION ALL
      SELECT 'l_discount', CAST(count(*) AS DOUBLE),
             CAST(count(DISTINCT l_discount) AS DOUBLE),
             CAST(count(*) - count(l_discount) AS DOUBLE),
             round(avg(l_discount), 6), round(stddev_samp(l_discount), 6),
             round(min(l_discount), 6), round(max(l_discount), 6),
             round(quantile_cont(l_discount, 0.25), 6),
             round(quantile_cont(l_discount, 0.5), 6),
             round(quantile_cont(l_discount, 0.75), 6)
      FROM src
      UNION ALL
      SELECT 'l_tax', CAST(count(*) AS DOUBLE),
             CAST(count(DISTINCT l_tax) AS DOUBLE),
             CAST(count(*) - count(l_tax) AS DOUBLE),
             round(avg(l_tax), 6), round(stddev_samp(l_tax), 6),
             round(min(l_tax), 6), round(max(l_tax), 6),
             round(quantile_cont(l_tax, 0.25), 6),
             round(quantile_cont(l_tax, 0.5), 6),
             round(quantile_cont(l_tax, 0.75), 6)
      FROM src
    )
    """,
)
def summarize_data(spark, sf_dir):
    """SummarizeData stage, exact mode (parity: stages/SummarizeData.scala
    — but ONE aggregation pass for all columns instead of the reference's
    per-column union+outer-join of sub-frames)."""
    from mmlspark_spark.operators import SelectColumns, SummarizeData

    li = SelectColumns(
        cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).transform(_t(spark, sf_dir, "lineitem"))
    out = SummarizeData(exact=True).transform(li)
    rounded = [F.col("feature")] + [
        F.col(c).alias(c) if c in ("count", "unique_value_count", "missing_value_count")
        else F.round(F.col(c), 6).alias(c)
        for c in ["count", "unique_value_count", "missing_value_count",
                  "mean", "stddev", "min", "max", "p25", "median", "p75"]
    ]
    return out.select(*rounded)


@register("summarize_data_approx", oracle=None, headline=True)
def summarize_data_approx(spark, sf_dir):
    """SummarizeData in its 100 TB configuration: HLL approx-distinct +
    QuantileSummaries approx percentiles — ONE aggregation pass, no
    EXPAND (exact multi-count-distinct multiplies the shuffle by the
    number of distinct aggs). This is the headline bench variant; the
    exact variant above is the DuckDB-oracle correctness variant."""
    from mmlspark_spark.operators import SelectColumns, SummarizeData

    li = SelectColumns(
        cols=["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    ).transform(_t(spark, sf_dir, "lineitem"))
    return SummarizeData(exact=False).transform(li)


@register(
    "class_balancer",
    oracle="""
    WITH c AS (SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1)
    SELECT l_returnflag,
           round(CAST((SELECT max(n) FROM c) AS DOUBLE) / n, 6) AS weight
    FROM c
    """,
)
def class_balancer(spark, sf_dir):
    """ClassBalancer estimator: per-label weight = max count / count
    (parity: stages/ClassBalancer.scala:41-57); weights table broadcast-
    joined in the model."""
    from mmlspark_spark.operators import ClassBalancer

    li = _t(spark, sf_dir, "lineitem")
    model = ClassBalancer(inputCol="l_returnflag").fit(li)
    return model.weights.select(
        "l_returnflag", F.round(F.col("weight"), 6).alias("weight")
    )


@register(
    "ensemble_by_key",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(avg(l_quantity), 6) AS mean_l_quantity,
           round(avg(l_extendedprice), 6) AS mean_l_extendedprice
    FROM lineitem GROUP BY 1, 2
    """,
)
def ensemble_by_key(spark, sf_dir):
    """EnsembleByKey: groupBy keys + column means (parity:
    stages/EnsembleByKey.scala:83-127)."""
    from mmlspark_spark.operators import EnsembleByKey

    li = _t(spark, sf_dir, "lineitem")
    out = EnsembleByKey(
        keys=["l_returnflag", "l_linestatus"],
        cols=["l_quantity", "l_extendedprice"],
    ).transform(li)
    return out.select(
        "l_returnflag", "l_linestatus",
        F.round("mean_l_quantity", 6).alias("mean_l_quantity"),
        F.round("mean_l_extendedprice", 6).alias("mean_l_extendedprice"),
    )


