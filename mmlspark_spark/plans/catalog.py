"""Query catalog: every implemented operator exposed as a driver-checkable
query with (where SQL-expressible) a DuckDB oracle.

Contract (driver): each query fn takes (spark, sf_dir) and returns a
DataFrame; the oracle SQL runs on DuckDB views named after the parquet
tables. Column names are aliased identically on both sides; doubles that
come out of aggregation are rounded identically on both sides so the
order-insensitive value-hash matches despite floating-point summation
order differing between engines.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mmlspark_spark.core.session import configure_session, load_table


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, None → rows-only check
    headline: bool = False  # included in bench.py
    tags: tuple = field(default_factory=tuple)


CATALOG: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False, tags: tuple = ()):
    def deco(fn):
        fn.__query_name__ = name

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            configure_session(spark)
            return fn(spark, sf_dir)

        CATALOG[name] = QuerySpec(name, wrapped, oracle, headline, tags)
        return fn

    return deco


# Driver correctness-checks a window of the first 50 entries of
# queries(). Round-15 priority, in order of evidence need (the
# groups are annotated inline below): (a) the ONE new lane —
# never-green oracled queries must be windowed (fairness lint);
# (b) re-gates for the two lanes whose code paths materially changed
# this round (WARC streaming-member decode + resource-record typing;
# BM25 delta-sized append df refresh); (c) the 16 r11-green lanes
# the r14 window deferred, at exactly staleness age 4 (the lint
# bound — the round-14 verdict's "r15 must-window set"); (d) 31 of
# the 50 r12-green queries (age 3), taken in their r12 window
# order. The r16 backlog is the 19 remaining r12-green lanes
# (tpch_q17, tpch_q18, tpch_q22, asof_join, audio_fingerprint_dedup,
# class_balancer, cube_counts, domain_temperature_mix, drop_missing,
# drop_rename, ensemble_by_key, explode_tokens, image_dhash_dedup,
# isolation_forest, knn_ivf_pretrained, knn_lsh, knn_stage,
# minhash_dedup, partition_ops_identity — age 4 at the r16 check,
# the lint will force them) plus whatever r16 adds.
# test_window_rotation_fairness mechanizes all of this: an oracled
# query whose last driver green would fall more than 4 rounds stale
# under the planned window fails the lint, as does a new oracled
# query parked outside the window.
_WINDOW_PRIORITY = (
    # (a) the NEW round-15 lane: the APPEND boundary of the shared
    #     FingerprintIndexMixin (simhash/image/audio/video families)
    "simhash_match_appended",
    # (b) re-gates: lanes whose engine code changed this round
    "warc_roundtrip", "bm25_search_appended",
    # (c) the r15 must-window set: the 16 r11-green lanes the r14
    #     window deferred, at exactly age 4 this round
    "sar_recommend", "tenant_standard_scaler", "tenant_linear_scaler",
    "id_indexer", "per_instance_log_loss", "ranking_metrics",
    "featurize_numeric", "decontamination", "zorder_key",
    "hash_split", "vocab_build", "chunk_overlap", "cdc_chunks",
    "url_canonicalize", "winnow_fingerprint",
    "train_classifier_metrics",
    # (d) 31 of the 50 r12-green queries (age 3), in r12 window
    #     order so the r16 plan stays lint-clean mechanically
    "video_match_indexed", "video_dhash_dedup", "bm25_phrase_indexed",
    "minhash_match_indexed", "simhash_match_indexed",
    "embedding_match_indexed", "minhash_match_tombstoned",
    "bm25_search_tombstoned", "knn_lsh_indexed", "corpus_report",
    "curation_pipeline", "doc_fingerprint", "embedding_covariance",
    "index_to_value_roundtrip", "json_extract", "lang_id_heuristic",
    "model_statistics", "quality_filter", "stratified_sample",
    "substring_dedup_spans", "tpch_q1", "tpch_q3", "tpch_q5",
    "tpch_q6", "tpch_q7", "tpch_q8", "tpch_q10", "tpch_q12",
    "tpch_q13", "tpch_q14", "tpch_q15",
)
# exactly 50 entries — the driver window size; a 51st would be
# silently parked outside
assert len(_WINDOW_PRIORITY) == 50, len(_WINDOW_PRIORITY)


def _ordered_specs() -> list[QuerySpec]:
    """Priority-listed queries first IN LIST ORDER (including
    rows-only entries — the only way a rows-only query can ever enter
    the driver's window, since everything after the priority block is
    oracled-first), then the remaining oracled queries (stable by
    registration order), then the remaining rows-only. List position
    matters — a sort key of mere membership would fall back to
    registration order inside the priority group, silently parking
    late-registered queries outside the window. The SAME ordering
    drives every exported view (queries(), oracle_sql()) so positional
    consumers can never mispair them."""
    rank = {n: i for i, n in enumerate(_WINDOW_PRIORITY)}
    return sorted(
        CATALOG.values(),
        key=lambda s: (rank.get(s.name, len(_WINDOW_PRIORITY)),
                       s.oracle is None))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    return {spec.name: spec.oracle for spec in _ordered_specs()
            if spec.oracle is not None}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


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
    od = (lo.groupBy(F.col("l_orderkey").alias("__ok"))
          .agg(F.countDistinct("l_suppkey").alias("n_supp"),
               F.countDistinct(
                   F.when(F.col("late") == 1, F.col("l_suppkey")))
               .alias("n_late")))
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
# Featurization (SURVEY §2.8, §2.10)
# ---------------------------------------------------------------------------

@register(
    "value_indexer",
    oracle="""
    WITH lv AS (
      SELECT l_returnflag,
             CAST(dense_rank() OVER (ORDER BY l_returnflag) - 1 AS INTEGER) AS idx
      FROM (SELECT DISTINCT l_returnflag FROM lineitem)
    )
    SELECT idx, count(*) AS n
    FROM lineitem JOIN lv USING (l_returnflag)
    GROUP BY idx
    """,
)
def value_indexer(spark, sf_dir):
    """ValueIndexer: deterministic sorted distinct→index mapping applied
    via broadcast join (parity: featurize/ValueIndexer.scala:56-203)."""
    from mmlspark_spark.featurize import ValueIndexer

    li = _t(spark, sf_dir, "lineitem")
    model = ValueIndexer(inputCol="l_returnflag", outputCol="idx").fit(li)
    return model.transform(li).groupBy("idx").agg(F.count("*").alias("n"))


@register(
    "clean_missing",
    oracle="""
    WITH t AS (
      SELECT o_orderpriority,
             CASE WHEN o_totalprice < 100000 THEN NULL ELSE o_totalprice END AS v
      FROM orders
    ), m AS (SELECT avg(v) AS mv FROM t)
    SELECT o_orderpriority,
           round(sum(coalesce(v, (SELECT mv FROM m))), 4) AS total,
           count(*) AS n
    FROM t GROUP BY o_orderpriority
    """,
)
def clean_missing(spark, sf_dir):
    """CleanMissingData mean imputation (parity:
    featurize/CleanMissingData.scala:48-139): null out small orders, fit
    the mean on the rest, impute, aggregate."""
    from mmlspark_spark.featurize import CleanMissingData

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.when(F.col("o_totalprice") < 100000, None)
        .otherwise(F.col("o_totalprice")).alias("v"),
    )
    model = CleanMissingData(cols=["v"], cleaningMode="Mean").fit(orders)
    return (
        model.transform(orders)
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("v"), 4).alias("total"), F.count("*").alias("n"))
    )


@register(
    "data_conversion",
    oracle="""
    SELECT CAST(l_quantity AS INTEGER) AS qty_int,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
           count(*) AS n
    FROM lineitem GROUP BY 1, 2
    """,
)
def data_conversion(spark, sf_dir):
    """DataConversion: numeric + timestamp→formatted-string casts
    (parity: featurize/DataConversion.scala:83-157)."""
    from mmlspark_spark.featurize import DataConversion

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("qty_int"), F.col("l_shipdate").alias("ship_day")
    )
    out = DataConversion(cols=["qty_int"], convertTo="integer").transform(li)
    out = DataConversion(cols=["ship_day"], convertTo="string",
                         dateTimeFormat="yyyy-MM-dd").transform(out)
    return out.groupBy("qty_int", "ship_day").agg(F.count("*").alias("n"))


@register(
    "ts_featurize",
    oracle="""
    SELECT event_id,
           CAST(epoch_ms(ts) AS DOUBLE) AS epoch_millis,
           CAST(year(ts) AS DOUBLE) AS year,
           CAST(dayofweek(ts) + 1 AS DOUBLE) AS day_of_week,
           CAST(month(ts) AS DOUBLE) AS month,
           CAST(day(ts) AS DOUBLE) AS day_of_month,
           CAST(hour(ts) AS DOUBLE) AS hour
    FROM events
    """,
)
def ts_featurize(spark, sf_dir):
    """Timestamp featurization components (parity:
    featurize/Featurize.scala:188-203) — DuckDB numbers weekdays 0-6
    (Sun=0), Spark 1-7 (Sun=1), so the oracle shifts by one."""
    from mmlspark_spark.featurize.auto import timestamp_features

    ev = _t(spark, sf_dir, "events")
    feats = timestamp_features("ts")
    names = ["epoch_millis", "year", "day_of_week", "month", "day_of_month", "hour"]
    return ev.select(
        "event_id", *[feats[i].alias(n) for i, n in enumerate(names)]
    )


@register(
    "multi_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS nt
      FROM documents
    )
    SELECT doc_id,
           CAST(greatest(nt, 0) + greatest(nt - 1, 0) + greatest(nt - 2, 0)
                AS INTEGER) AS n_grams
    FROM toks
    """,
)
def multi_ngram(spark, sf_dir):
    """MultiNGram over documents: total 1+2+3-gram count per doc
    (parity: featurize/text/MultiNGram.scala:26-70)."""
    from mmlspark_spark.featurize import MultiNGram
    from mmlspark_spark.functions import tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("toks")
    )
    out = MultiNGram(inputCol="toks", outputCol="grams",
                     lengths=[1, 2, 3]).transform(docs)
    return out.select("doc_id", F.size("grams").alias("n_grams"))


@register(
    "page_splitter",
    oracle="SELECT doc_id, text AS reassembled FROM documents",
)
def page_splitter(spark, sf_dir):
    """PageSplitter: word-boundary-preserving pagination. The oracle is
    the reassembly identity — concatenating the emitted pages must
    reproduce the original text byte-for-byte, which DuckDB checks by
    just selecting the source column (split-loss would hash-mismatch)."""
    from mmlspark_spark.featurize import PageSplitter

    docs = _t(spark, sf_dir, "documents")
    out = PageSplitter(inputCol="text", outputCol="pages",
                       maximumPageLength=200, minimumPageLength=100).transform(docs)
    return out.select(
        "doc_id", F.concat_ws("", "pages").alias("reassembled"))


def _text_featurize_oracle() -> str:
    """Replays the full TextFeaturizer pipeline: RegexTokenizer
    (lowercase, ``\\s+`` gaps split, empties dropped), MultiNGram
    [1,2] (2-grams joined by a single space), HashingTF slots
    (murmur3_x86_32 seed 42 + nonNegativeMod into 2^15 — recomputed
    bit-exact by plans/duckdb_xxh.murmur32_str) and the IDF zero rule
    (a slot present in EVERY document gets idf log(1)=0 and drops out
    of nnz). Token-less documents keep their row with nnz 0, exactly
    like the empty SparseVector."""
    from mmlspark_spark.plans.duckdb_xxh import murmur32_str, nonneg_mod32

    slot = nonneg_mod32(murmur32_str("term", u="yt"), 1 << 15)
    return f"""
    WITH d AS (
      SELECT doc_id, list_filter(
               string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents
    ), grams AS (
      SELECT doc_id,
             unnest(toks || list_transform(
               range(1, greatest(len(toks)-1, 0)+1),
               i -> toks[i] || ' ' || toks[i+1])) AS term
      FROM d
    ), slots AS (
      SELECT DISTINCT doc_id, {slot} AS slot FROM grams
    ), dfreq AS (
      SELECT slot, count(*) AS df FROM slots GROUP BY slot
    )
    SELECT d.doc_id, CAST(coalesce(z.nnz, 0) AS INTEGER) AS nnz
    FROM d LEFT JOIN (
      SELECT s.doc_id, count(*) FILTER (
        WHERE dfreq.df < (SELECT count(*) FROM d)) AS nnz
      FROM slots s JOIN dfreq USING (slot) GROUP BY s.doc_id
    ) z USING (doc_id)
    """


@register("text_featurize_pipeline", oracle=_text_featurize_oracle(),
          headline=True)
def text_featurize_pipeline(spark, sf_dir):
    """TextFeaturizer end-to-end (tokenize → 1,2-grams → hashTF → IDF)
    over documents; returns per-doc nonzero-slot counts, HASH-EXACT
    against a DuckDB oracle replaying the murmur3 slot layout and the
    IDF zero rule (rows-only before round 8)."""
    from mmlspark_spark.featurize import TextFeaturizer

    docs = _t(spark, sf_dir, "documents")
    model = TextFeaturizer(inputCol="text", outputCol="features",
                           nGramLengths=[1, 2], numFeatures=1 << 15).fit(docs)
    out = model.transform(docs)
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array(F.col("features"))
    nnz = F.size(F.filter(arr, lambda x: x != 0.0))
    return out.select("doc_id", nnz.alias("nnz"))


# ---------------------------------------------------------------------------
# LLM training-data pipeline: text analysis, dedup, similarity
# ---------------------------------------------------------------------------

@register(
    "token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS INTEGER) AS n_tokens
    FROM documents
    """,
)
def token_count_q(spark, sf_dir):
    """Whitespace token counting as a pure Catalyst expression — one map
    stage over the corpus, no shuffle."""
    from mmlspark_spark.functions import token_count

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count("text").alias("n_tokens"))


@register(
    "quality_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, length(text) AS len_chars,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id, len_chars,
           CAST(len(t) AS INTEGER) AS n_tokens,
           round(CAST(len(list_filter(t, x -> length(x) >= 6)) AS DOUBLE) / len(t), 6)
             AS long_token_ratio,
           round(CAST(len(list_filter(t, x -> lower(x) IN ('the','a','of','and','to','in','is','it')))
                 AS DOUBLE) / len(t), 6) AS stopword_ratio
    FROM toks
    """,
)
def quality_score(spark, sf_dir):
    """Document quality heuristics (C4/Gopher-style): length, token count,
    long-token ratio, stopword density. All expressions, zero UDFs."""
    from mmlspark_spark.functions import stopword_ratio, token_count, tokens

    docs = _t(spark, sf_dir, "documents")
    t = tokens("text")
    long_ratio = (
        F.size(F.filter(t, lambda x: F.length(x) >= 6)).cast("double") / F.size(t)
    )
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        token_count("text").alias("n_tokens"),
        F.round(long_ratio, 6).alias("long_token_ratio"),
        F.round(stopword_ratio("text"), 6).alias("stopword_ratio"),
    )


@register(
    "lang_stats",
    oracle="""
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents GROUP BY lang
    """,
)
def lang_stats(spark, sf_dir):
    """Per-language corpus profile (companion to language-ID scoring)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


@register(
    "exact_dedup",
    oracle="""
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def exact_dedup(spark, sf_dir):
    """ExactDeduplicator: hash-groupBy dedup keeping the lowest id.
    Shuffle key is the 128-bit content hash, never the document text."""
    from mmlspark_spark.llm import ExactDeduplicator

    docs = _t(spark, sf_dir, "documents")
    kept = ExactDeduplicator(keyCols=["text"], idCol="doc_id").transform(docs)
    sizes = docs.groupBy(F.md5(F.col("text")).alias("__h")).agg(
        F.count("*").alias("n_copies")
    )
    return (
        kept.withColumn("__h", F.md5(F.col("text")))
        .join(sizes, "__h")
        .select("doc_id", "n_copies")
    )


@register(
    "ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
    FROM pairs
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    """,
    headline=True,
)
def ngram_jaccard_q(spark, sf_dir):
    """Exact word-5-gram Jaccard over shingle-sharing pairs — the
    candidate space is pruned by the shingle equi-join (SURVEY 'LLM
    extras'; scale path = MinHash below)."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    out = ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
    final = out.select("doc_a", "doc_b",
                       F.round("jaccard", 6).alias("jaccard"))
    # .select() returns a new object without the attached persisted
    # handles — propagate so bench's release_intermediates frees them
    return propagate_intermediates(out, final)


@register(
    "curation_pipeline",
    oracle="""
    WITH RECURSIVE kept AS (
      SELECT doc_id, lang, source, text FROM documents
      WHERE NOT (length(text) < 200
                 OR length(text) > 100000
                 OR len(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) < 40
                 OR CAST(length(text) - length(regexp_replace(text,
                      '[^\\w\\s]', '', 'g')) AS DOUBLE)
                    / greatest(length(text), 1) > 0.05
                 OR (CASE WHEN len(list_filter(string_split(text, chr(10)),
                                               x -> x <> '')) > 0
                     THEN CAST(len(list_filter(string_split(text, chr(10)),
                                               x -> x <> ''))
                            - len(list_distinct(list_filter(
                                  string_split(text, chr(10)),
                                  x -> x <> ''))) AS DOUBLE)
                          / len(list_filter(string_split(text, chr(10)),
                                            x -> x <> ''))
                     ELSE 0.0 END) > 0.5)
    ), toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM kept
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT doc_a, doc_b FROM inter
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM j
      UNION SELECT doc_b, doc_a FROM j
    ), reach(n, m) AS (
      SELECT a, a FROM edges
      UNION SELECT a, b FROM edges
      UNION SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    ), losers AS (
      SELECT n AS doc_id FROM reach GROUP BY n HAVING n <> min(m)
    ), surviving AS (
      SELECT k.doc_id, k.lang, k.source FROM kept k
      WHERE k.doc_id NOT IN (SELECT doc_id FROM losers)
    )
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM surviving
    ) WHERE rn <= 10
    """)
def curation_pipeline_q(spark, sf_dir):
    """End-to-end corpus curation, the north-star composition proof:
    QualityFilter (C4/Gopher rules) → near-dup resolution (exact
    5-gram Jaccard ≥ 0.5, connected components, min-id survivor) →
    StratifiedSampler cap of 10 per (lang, source). Every stage is
    deterministic, so the WHOLE pipeline is verified exactly against
    one SQL replay (CASE filter → recursive-CTE closure anti-join →
    window cap)."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
        propagate_intermediates,
    )
    from mmlspark_spark.llm import (
        QualityFilter,
        ngram_jaccard_pairs,
        resolve_duplicate_clusters,
    )
    from mmlspark_spark.operators.stages import StratifiedSampler

    docs = _t(spark, sf_dir, "documents")
    # `kept` feeds both the shingle pipeline and the left_anti branch;
    # AQE does not reuse the multi-consumer subtree, so without the
    # pin the QualityFilter scan + tokenization would run twice
    kept = persist_intermediate(
        QualityFilter(minChars=200, minTokens=40,
                      maxPunctRatio=0.05).transform(docs)
        .filter(F.col("keep")).drop("keep", "reason"))
    pairs = ngram_jaccard_pairs(kept, "doc_id", "text", n=5)
    losers = (resolve_duplicate_clusters(
        pairs.filter(F.col("jaccard") >= 0.5))
        .filter(~F.col("is_kept")).select("doc_id"))
    surviving = kept.join(losers, "doc_id", "left_anti")
    capped = StratifiedSampler(stratumCols=["lang", "source"],
                               perStratum=10,
                               orderBy="doc_id").transform(surviving)
    out = propagate_intermediates(
        pairs, capped.select("doc_id", "lang", "source"))
    return attach_intermediates(out, kept)


@register(
    "substring_dedup_spans",
    oracle="""
    WITH win AS (
      SELECT doc_id, i AS pos, i + 39 AS e,
             md5(substr(text, i, 40)) AS h
      FROM documents,
           unnest(range(1, greatest(length(text) - 38, 1))) AS t(i)
      WHERE length(text) >= 40
    ), dup AS (
      SELECT h FROM win GROUP BY h HAVING count(*) > 1
    ), marked AS (
      SELECT doc_id, pos, e FROM win JOIN dup USING (h)
    ), flagged AS (
      SELECT doc_id, pos, e,
             CASE WHEN pos > coalesce(max(e) OVER (
                    PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) THEN 1 ELSE 0 END AS f
      FROM marked
    ), islands AS (
      SELECT doc_id, pos, e,
             sum(f) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW) AS g
      FROM flagged
    )
    SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
    FROM islands GROUP BY doc_id, g
    """)
def substring_dedup_spans_q(spark, sf_dir):
    """Exact duplicated-substring detection (k=40): every maximal
    character span whose 40-char windows repeat anywhere in the
    corpus. The oracle replays windowing, duplicate marking, and
    interval-island merging from scratch in SQL."""
    from mmlspark_spark.llm.dedup import duplicated_substring_spans

    docs = _t(spark, sf_dir, "documents")
    # maxDocsPerWindow=None: exact semantics, matching the uncapped
    # oracle (the ngram_jaccard convention for oracled queries)
    return duplicated_substring_spans(docs, "doc_id", "text", k=40,
                                      maxDocsPerWindow=None)


@register(
    "embedding_covariance",
    oracle="""
    WITH ex AS (
      SELECT vec_id,
             unnest(embedding) AS v,
             unnest(range(1, len(embedding) + 1)) AS i
      FROM embeddings
    )
    SELECT a.i - 1 AS i, b.i - 1 AS j,
           round(avg(a.v * b.v) - avg(a.v) * avg(b.v), 6) AS cov
    FROM ex a JOIN ex b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY 1, 2
    """)
def embedding_covariance_q(spark, sf_dir):
    """EmbeddingPCA's fit statistics verified cross-engine: the
    distributed one-pass (count, Σx, Σxxᵀ) moment reduction must
    reproduce the population covariance DuckDB computes from scratch —
    upper triangle, 6dp. This checks the operator's math, not just
    its output shape; the eigendecomposition on top is unit-tested
    against planted components (sign/order canonicalized)."""
    from mmlspark_spark.llm.embeddings import EmbeddingPCA

    emb = _t(spark, sf_dir, "embeddings")
    cov = EmbeddingPCA(inputCol="embedding").covariance(emb)
    d = cov.shape[0]
    rows = [(i, j, float(round(cov[i, j], 6)))
            for i in range(d) for j in range(i, d)]
    return spark.createDataFrame(rows, "i int, j int, cov double")


@register(
    "quality_filter",
    oracle="""
    SELECT doc_id, reason, (reason IS NULL) AS keep FROM (
      SELECT doc_id,
        CASE
          WHEN length(text) < 200 THEN 'too_short'
          WHEN length(text) > 100000 THEN 'too_long'
          WHEN len(list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> '')) < 40 THEN 'too_few_tokens'
          WHEN CAST(length(text) - length(regexp_replace(text,
                 '[^\\w\\s]', '', 'g')) AS DOUBLE)
               / greatest(length(text), 1) > 0.05 THEN 'punct_heavy'
          WHEN (CASE WHEN len(list_filter(string_split(text, chr(10)),
                                          x -> x <> '')) > 0
                THEN CAST(len(list_filter(string_split(text, chr(10)),
                                          x -> x <> ''))
                       - len(list_distinct(list_filter(
                             string_split(text, chr(10)),
                             x -> x <> ''))) AS DOUBLE)
                     / len(list_filter(string_split(text, chr(10)),
                                       x -> x <> ''))
                ELSE 0.0 END) > 0.5 THEN 'repetitious'
        END AS reason
      FROM documents
    )
    """)
def quality_filter_q(spark, sf_dir):
    """C4/Gopher rule filter with auditable drop reasons — pure
    expressions, one map stage (QualityFilter op). Thresholds chosen
    so the sf corpus exercises both verdicts."""
    from mmlspark_spark.llm.quality import QualityFilter

    docs = _t(spark, sf_dir, "documents")
    out = QualityFilter(minChars=200, minTokens=40,
                        maxPunctRatio=0.05).transform(docs)
    return out.select("doc_id", "reason", "keep")


@register(
    "stratified_sample",
    oracle="""
    SELECT doc_id, lang, source FROM (
      SELECT doc_id, lang, source,
             row_number() OVER (PARTITION BY lang, source
                                ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn <= 10
    """)
def stratified_sample_q(spark, sf_dir):
    """Exact per-stratum subsample: cap each (lang, source) bucket at
    its 10 lowest doc ids — the deterministic training-data curation
    mode of StratifiedSampler (the seeded-Bernoulli mode is rows-only
    by nature). perStratum=10 BINDS at every driver sf (max stratum is
    16 docs at sf0.001/0.01), so the oracle actually exercises the
    capping logic, not an identity pass-through."""
    from mmlspark_spark.operators.stages import StratifiedSampler

    docs = _t(spark, sf_dir, "documents")
    out = StratifiedSampler(stratumCols=["lang", "source"], perStratum=10,
                            orderBy="doc_id").transform(docs)
    return out.select("doc_id", "lang", "source")


@register(
    "dedup_resolve",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS w
      FROM documents
    ), idx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-3, 1))) AS i FROM toks
    ), sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
               AS shingle
      FROM idx
    ), cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), j AS (
      SELECT doc_a, doc_b FROM inter
      JOIN cnt ca ON ca.doc_id = doc_a
      JOIN cnt cb ON cb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM j
      UNION SELECT doc_b, doc_a FROM j
    ), reach(n, m) AS (
      SELECT a, a FROM edges
      UNION SELECT a, b FROM edges
      UNION SELECT r.n, e.b FROM reach r JOIN edges e ON r.m = e.a
    )
    SELECT n AS doc_id, min(m) AS component,
           (n = min(m)) AS is_kept
    FROM reach GROUP BY n
    """)
def dedup_resolve_q(spark, sf_dir):
    """End-to-end dedup resolution: exact n-gram Jaccard candidates at
    threshold 0.5 → connected components over the pair graph → one
    canonical survivor (min doc id) per cluster. The oracle replays
    the clustering as a recursive transitive closure, so the iterative
    min-label propagation is verified exactly — component labels,
    membership, and survivor choice."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import (
        ngram_jaccard_pairs,
        resolve_duplicate_clusters,
    )

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
    close = pairs.filter(F.col("jaccard") >= 0.5)
    out = resolve_duplicate_clusters(close)
    return propagate_intermediates(pairs, out)


@register(
    "ngram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), uc AS (
      SELECT w, count(*) AS uc
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), v AS (SELECT count(*) AS v FROM uc),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks
    ), bc AS (SELECT b, count(*) AS bc FROM bg GROUP BY b),
    scored AS (
      SELECT g.doc_id,
             round(avg(ln((coalesce(bc.bc, 0) + 0.5)
                          / (coalesce(uc.uc, 0)
                             + 0.5 * (SELECT v FROM v)))), 6)
               AS avg_logprob,
             CAST(count(*) AS INTEGER) AS n_bigrams
      FROM bg g LEFT JOIN bc ON g.b = bc.b LEFT JOIN uc ON g.w1 = uc.w
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, s.avg_logprob,
           coalesce(s.n_bigrams, 0) AS n_bigrams
    FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
    """)
def ngram_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal: fit an exact add-k bigram model
    on the corpus, score every document by mean log-probability
    (NGramLanguageModel). Fit is two count shuffles; scoring is an
    explode + two hash joins on gram keys — and because the counts
    are exact integers the score is engine-portable, so the oracle
    verifies the actual probabilities hash-exact, not just row
    counts."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import NGramLanguageModel

    docs = _t(spark, sf_dir, "documents")
    model = NGramLanguageModel(textCol="text", k=0.5, lowercase=True).fit(docs)
    model.set("idCol", "doc_id")
    out = model.transform(docs)
    final = out.select(
        "doc_id", F.round("avg_logprob", 6).alias("avg_logprob"),
        "n_bigrams")
    # keep the persisted count-frame handles visible to the caller's
    # release_intermediates
    return propagate_intermediates(out, final)


@register(
    "domain_mix",
    oracle="""
    WITH w(lang, q) AS (
      VALUES ('en', 150), ('de', 60), ('fr', 45), ('es', 30), ('zh', 15)
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ((((doc_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647,
                        doc_id) AS rn
      FROM documents)
    SELECT doc_id, lang FROM ranked JOIN w USING (lang) WHERE rn <= q
    """)
def domain_mix(spark, sf_dir):
    """Target-mixture resampling (DomainMixer, exact mode): integer
    weights 10/4/3/2/1 over langs × budget 300 → quotas 150/60/45/30/15,
    filled by a deterministic Lehmer-hash ranking so the selection is a
    uniform-but-reproducible sample, not an ingest-order head. The
    oracle replays quota ranking with the same integer arithmetic —
    the mixture is verified membership-exact. (The zero-shuffle rate
    mode is the 100 TB path; it trades quota exactness for a map-only
    plan and is recall-tested in tests/ instead.)"""
    from mmlspark_spark.llm import DomainMixer

    docs = _t(spark, sf_dir, "documents")
    mixer = DomainMixer(
        domainCol="lang", idCol="doc_id",
        weights={"en": 10, "de": 4, "fr": 3, "es": 2, "zh": 1},
        totalBudget=300, exact=True, seed=42)
    return mixer.transform(docs).select("doc_id", "lang")


@register(
    "domain_temperature_mix",
    oracle="""
    WITH counts AS (
      SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
    ), w AS (
      SELECT lang,
             CAST(floor(pow(cnt, 0.5) * 1000000) AS BIGINT) AS wi
      FROM counts
    ), q AS (
      SELECT lang,
             300 * wi // (SELECT CAST(sum(wi) AS BIGINT) FROM w) AS quota
      FROM w
    ), ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ((((doc_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647,
                        doc_id) AS rn
      FROM documents)
    SELECT r.doc_id, r.lang FROM ranked r
    JOIN q ON r.lang IS NOT DISTINCT FROM q.lang
    WHERE rn <= quota
    """)
def domain_temperature_mix(spark, sf_dir):
    """Temperature-sampled mixture (DomainMixer(temperature=0.5)):
    weights derived from the observed per-lang counts as count^0.5 —
    the XLM-R/mT5 recipe that flattens a head-heavy corpus toward its
    rare domains (en dominates this table ~3:1 over each other lang;
    at α=0.5 its quota share shrinks toward parity). The float pow is
    quantized to an integer weight (floor(count^α·10⁶)) and the quota
    is exact integer arithmetic (budget·w // Σw), so the oracle
    replays quota derivation AND the Lehmer-ranked fill bit-for-bit —
    membership-exact like domain_mix, but with the weights COMPUTED
    from the data instead of given."""
    from mmlspark_spark.llm import DomainMixer

    docs = _t(spark, sf_dir, "documents")
    mixer = DomainMixer(domainCol="lang", idCol="doc_id",
                        temperature=0.5, totalBudget=300,
                        exact=True, seed=42)
    return mixer.transform(docs).select("doc_id", "lang")


@register(
    "chunk_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                                 x -> x <> '') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), 16)) AS st
      FROM t WHERE len(toks) > 0
    )
    SELECT doc_id,
           CAST(st // 16 AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, st + 1, st + 32)) AS BIGINT)
             AS n_tokens,
           array_to_string(list_slice(toks, st + 1, st + 32), ' ')
             AS chunk
    FROM s
    """)
def chunk_overlap(spark, sf_dir):
    """Overlap-stride chunking (chunk_documents, 32-token windows
    every 16): the retrieval/eval-prep layout — consecutive chunks
    share half their tokens so no boundary-straddling span is lost.
    Map-only plan: tokenize once per row behind a Generate barrier
    (CollapseProject would otherwise re-inline the tokenize into every
    slice, O(tokens × chunks) per doc), then sequence+slice+posexplode
    — no shuffle at any scale. The oracle replays windows, stride
    arithmetic and the whitespace class token-for-token."""
    from mmlspark_spark.llm import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    out = chunk_documents(docs, idCol="doc_id", textCol="text",
                          chunkTokens=32, stride=16)
    return out.select("doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"),
                      F.col("n_tokens").cast("long").alias("n_tokens"),
                      "chunk")


@register(
    "vocab_build",
    oracle="""
    WITH words AS (
      SELECT unnest(list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '')) AS word
      FROM documents
    ), hist AS (
      SELECT word, CAST(count(*) AS BIGINT) AS freq
      FROM words GROUP BY word HAVING count(*) >= 3
    )
    SELECT CAST(row_number() OVER (ORDER BY freq DESC, word) - 1
                AS BIGINT) AS token_id,
           word, freq
    FROM hist
    """)
def vocab_build(spark, sf_dir):
    """Distributed word-level vocabulary (build_vocabulary, minCount=3)
    — the artifact LLM pipelines ship to tokenizers / LM smoothing.
    Corpus-scale work is one tokenize + groupBy(word) shuffle; the
    deterministic (freq DESC, word ASC) id ranking runs over the
    vocabulary-sized histogram (Heaps' law — MBs at 100 TB corpus
    scale), where a single-partition sort is harmless. Hash-exact:
    tokenize class, tie-break, and id arithmetic all replay in SQL."""
    from mmlspark_spark.llm import build_vocabulary

    docs = _t(spark, sf_dir, "documents")
    return build_vocabulary(docs, textCol="text", minCount=3)


def _bpe_merges_oracle(num_merges: int = 8, max_doc: int = 40) -> str:
    """Replays the BPE merge-learning loop (tokenizer._learn_merges)
    at toy scale by UNROLLING the iterations into generated CTEs —
    one (pair-count → argmax-with-lex-ties → greedy-merge) block per
    merge. The greedy non-overlapping left-to-right merge inside each
    word is a list_reduce fold whose accumulator is a
    struct(o := chr(1)-joined emitted symbols, p := pending symbol):
    merging sets p := l||r (the merged symbol can never be the left
    of the same pair again — exactly Python's i += 2), otherwise p is
    emitted onto o. Strings, not a struct-of-list accumulator —
    DuckDB 1.0's list_reduce mis-folds list-typed struct fields.
    Tie-break is (count DESC, l ASC, r ASC), byte order == code-point
    order under UTF-8, matching the Python heap's tuple order. The
    big-corpus lane (bpe_tokenize) stays rows-only by design: at
    numMerges=1000 the unrolled SQL would be ~3000 CTEs, and merge
    learning is still driver-side over the Heaps-law histogram either
    way — this toy lane proves the ALGORITHM replays exactly."""
    parts = [f"""
    WITH words AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(text), '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '')) AS w
      FROM documents
      WHERE doc_id < {max_doc} AND text IS NOT NULL
        AND strpos(text, chr(1)) = 0
    ), st0 AS (
      SELECT w, CAST(count(*) AS BIGINT) AS c,
             list_append(list_transform(range(length(w)),
                                        i -> w[i+1:i+1]), '</w>') AS syms
      FROM words GROUP BY w
    )"""]
    for i in range(1, num_merges + 1):
        parts.append(f""", pc{i} AS (
      SELECT pr.l AS l, pr.r AS r, CAST(sum(c) AS BIGINT) AS cnt FROM (
        SELECT c, unnest(list_transform(range(len(syms) - 1),
                 j -> struct_pack(l := syms[j+1], r := syms[j+2]))) AS pr
        FROM st{i-1}) GROUP BY pr.l, pr.r
    ), best{i} AS (
      SELECT l, r FROM pc{i} ORDER BY cnt DESC, l ASC, r ASC LIMIT 1
    ), st{i} AS (
      SELECT w, c, list_filter(string_split(f.o || chr(1) || f.p, chr(1)),
                               s -> s <> '') AS syms
      FROM (SELECT w, c, list_reduce(
              list_transform(syms, s -> struct_pack(o := '', p := s)),
              (a, x) -> CASE WHEN a.p = b.l AND x.p = b.r
                        THEN struct_pack(o := a.o, p := a.p || x.p)
                        ELSE struct_pack(o := a.o || chr(1) || a.p,
                                         p := x.p) END) AS f
            FROM st{i-1}, best{i} b)
    )""")
    sel = " UNION ALL ".join(
        f"SELECT CAST({i} AS INT) AS rnk, l, r FROM best{i}"
        for i in range(1, num_merges + 1))
    parts.append(f" SELECT * FROM ({sel}) ORDER BY rnk")
    return "".join(parts)


@register("bpe_merges_small", oracle=_bpe_merges_oracle())
def bpe_merges_small(spark, sf_dir):
    """BPE merge learning (BPETokenizer.fit) at toy scale — the
    data-dependent half of BPE, fully replayed: the fit's ONE
    distributed shuffle builds the word histogram (docs 0..39,
    lowercased, ASCII-whitespace split), then 8 argmax merges with
    (count DESC, pair lex ASC) tie-breaks learn the merge table.
    Returns (rnk, l, r) — the fitted artifact itself. The production
    lane (bpe_tokenize, numMerges=1000 over the full corpus) shares
    this exact code path and stays rows-only only because 1000
    unrolled CTEs is not a reasonable oracle; the algorithm is proven
    here and the encode side is pinned by hand-computed sequences in
    tests."""
    from mmlspark_spark.llm.tokenizer import BPETokenizer

    docs = (_t(spark, sf_dir, "documents")
            .filter((F.col("doc_id") < 40)
                    & F.col("text").isNotNull()
                    & ~F.col("text").contains("\x01")))
    model = BPETokenizer(textCol="text", numMerges=8).fit(docs)
    return spark.createDataFrame(
        [(i + 1, m[0], m[1]) for i, m in enumerate(model.merges)],
        "rnk int, l string, r string")


@register(
    "hash_split",
    oracle="""
    WITH h1 AS (
      SELECT doc_id,
             (((doc_id + 42) % 2147483647) * 48271) % 2147483647 AS h
      FROM documents
    ), h2 AS (
      SELECT doc_id, (xor(h, h >> 15) * 48271) % 2147483647 AS h
      FROM h1
    ), u AS (
      SELECT doc_id, xor(h, h >> 13) % 2147483647 AS u FROM h2
    )
    SELECT doc_id,
           CASE WHEN u < 1932735282 THEN 'train'
                WHEN u < 2040109464 THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """)
def hash_split(spark, sf_dir):
    """Deterministic train/val/test split (HashSplitter 90/5/5): a
    row's split is a pure function of its id via a NONLINEAR
    xorshift-Lehmer uniform (the plain Lehmer key is linear in the id
    — sequential ids form a lattice that can leave a narrow band
    empty), so assignment survives corpus growth (new docs never move
    old docs between splits — randomSplit reshuffles every run and
    leaks test into train). Thresholds are exact integers
    floor(cum_frac × m) (1932735282 = ⌊0.9·(2³¹−1)⌋, 2040109464 =
    ⌊0.95·(2³¹−1)⌋), and the oracle replays multiply/xorshift/
    threshold bit-for-bit. One CASE expression on a map stage — zero
    shuffles at any scale."""
    from mmlspark_spark.llm import HashSplitter

    docs = _t(spark, sf_dir, "documents")
    out = HashSplitter(idCol="doc_id",
                       splits={"train": 0.9, "val": 0.05, "test": 0.05},
                       seed=42).transform(docs)
    return out.select("doc_id", "split")


@register(
    "embedding_kmeans_assign",
    oracle="""
    WITH cent AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec,
             row_number() OVER (
               ORDER BY ((((vec_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647, vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (SELECT CAST(rk - 1 AS INTEGER) AS cluster, cvec
             FROM cent WHERE rk <= 8),
    d AS (
      SELECT e.vec_id, c.cluster,
             list_distance(CAST(e.embedding AS DOUBLE[]), c.cvec) AS dist
      FROM embeddings e CROSS JOIN c
      WHERE e.embedding IS NOT NULL
    )
    SELECT vec_id, cluster FROM (
      SELECT vec_id, cluster,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY dist, cluster) AS rn
      FROM d
    ) WHERE rn = 1
    """)
def embedding_kmeans_assign(spark, sf_dir):
    """EmbeddingKMeans assignment pass (maxIter=0): nearest of the 8
    hash-rank-seeded centroids per vector, ties to the lower cluster
    index. Centroids broadcast into one Arrow-batched argmin map — no
    shuffle — and every step (hash-ranked init, argmin, tie-break) is
    deterministic, so the oracle replays the whole operator (both
    sides use the direct (x-c)² distance form and a lower-index
    tie-break; the only residual divergence channel is float
    summation order inside the distance itself, negligible off exact
    ties). NULL vectors are excluded on both sides — the model's
    NULL→NULL cluster contract has no SQL analog. The Lloyd
    iterations on top (update = posexplode + partial-agg avg) are
    convergence-tested in tests/ instead (iteration count is
    data-dependent)."""
    from mmlspark_spark.llm import EmbeddingKMeans

    emb = _t(spark, sf_dir, "embeddings")
    model = EmbeddingKMeans(inputCol="embedding", idCol="vec_id",
                            k=8, maxIter=0).fit(emb)
    return (model.transform(emb)
            .filter(F.col("embedding").isNotNull())
            .select("vec_id", F.col("__km_cluster").alias("cluster")))


@register(
    "semantic_dedup",
    oracle="""
    WITH cent AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec,
             row_number() OVER (
               ORDER BY ((((vec_id + 42) % 2147483647) * 48271 % 2147483647)
                         * 48271) % 2147483647, vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (SELECT CAST(rk - 1 AS INTEGER) AS cluster, cvec
             FROM cent WHERE rk <= 8),
    asg AS (
      SELECT vec_id, cluster, v FROM (
        SELECT e.vec_id, c.cluster, CAST(e.embedding AS DOUBLE[]) AS v,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]),
                                        c.cvec),
                          c.cluster) AS rn
        FROM embeddings e CROSS JOIN c
        WHERE e.embedding IS NOT NULL
      ) WHERE rn = 1
    ), dropped AS (
      SELECT DISTINCT b.vec_id AS idb
      FROM asg a JOIN asg b ON a.cluster = b.cluster
                           AND a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    )
    SELECT vec_id, cluster,
           vec_id NOT IN (SELECT idb FROM dropped) AS is_kept
    FROM asg
    """)
def semantic_dedup_q(spark, sf_dir):
    """SemDeDup: cluster embeddings (8 deterministic cells), drop any
    row whose cell holds a lower-id row at cosine ≥ 0.3 (the synthetic
    embeddings are near-orthogonal, so 0.3 binds — 166 of 500 drop at
    sf0.01; a vacuous threshold proves nothing). Pairwise cost is
    Σ cᵢ² via the cluster equi-join, never N² — the oracle verifies
    cluster labels, membership, and survivor verdicts exactly."""
    from mmlspark_spark.llm import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, idCol="vec_id", vecCol="embedding",
                          k=8, threshold=0.3, maxIter=0)


def _minhash_cte(k: int = 32, b: int = 16, n: int = 5,
                    threshold: float = 0.2, cap: int = 1000) -> str:
    """DuckDB replay of the FULL MinHashLSHDeduplicator pipeline at its
    production configuration — tokenize (Java ``\\s`` spelled out, incl.
    ``\\x0B``/``\\f``), distinct 5-gram shingles, per-shingle
    ``xxhash64`` over UTF-8 bytes, k slot hashes (signed min, exactly
    Spark's ``min`` over LongType), banded bucket join with the
    ``maxBucketSize`` cap, upper-triangle pair expansion and the
    signature-match estimate. The xxhash64 values are recomputed
    bit-exact by the plans/duckdb_xxh expression generators, so this is
    the SAME hash family the 100 TB path uses, not a weakened oracle
    lane. Seeds for ``xxhash64(lit(i), x)`` fold to constants
    (``hashLong(x, hashInt(i, 42))``) in Python."""
    from mmlspark_spark.plans.duckdb_xxh import (hash_int, to_s64, to_u64,
                                                 xxh64_long, xxh64_str)

    r = k // b
    assert r == 2, "band expr below unrolls exactly r=2 slots"
    slot_seeds = "[" + ", ".join(
        f"{hash_int(i, 42)}::HUGEINT" for i in range(k)) + "]"
    band_seeds = "[" + ", ".join(
        f"{hash_int(j, 42)}::HUGEINT" for j in range(b)) + "]"
    sh_hash = xxh64_str("sh", u="za")  # unsigned HUGEINT
    slot_hash = to_s64(xxh64_long("shu", f"({slot_seeds}[si+1])", u="zb"))
    band_hash = xxh64_long(
        to_u64("sig[2*j+2]"),
        xxh64_long(to_u64("sig[2*j+1]"), f"({band_seeds}[j+1])", u="zc"),
        u="zd")
    est = f"(len(list_filter(range(1, {k}+1), i -> sa[i] = sb[i])))"
    # the chain ends in CTE ``mh(doc_a, doc_b, est_jaccard)`` so
    # dedup_recall can reuse the WHOLE replay as a fragment (the
    # _bm25_cte/_ivf_cte pattern); _minhash_oracle itself is just
    # SELECT * from it
    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), g AS (
      SELECT DISTINCT doc_id,
        unnest(list_transform(range(1, greatest(len(toks)-{n - 1}, 0)+1),
          i -> array_to_string(toks[i:i+{n - 1}], ' '))) AS sh
      FROM t
    ), shh AS (
      SELECT DISTINCT doc_id, {sh_hash} AS shu FROM g
    ), slotrows AS (
      SELECT doc_id, si, {slot_hash} AS hv
      FROM (SELECT doc_id, shu, unnest(range(0, {k})) AS si FROM shh)
    ), sig AS (
      SELECT doc_id, list(m ORDER BY si) AS sig
      FROM (SELECT doc_id, si, min(hv) AS m
            FROM slotrows GROUP BY doc_id, si)
      GROUP BY doc_id
    ), band AS (
      SELECT doc_id, j, {band_hash} AS bh
      FROM (SELECT doc_id, sig, unnest(range(0, {b})) AS j FROM sig)
    ), bucket AS (
      SELECT j, bh, list_sort(list(DISTINCT doc_id)) AS ids
      FROM band GROUP BY j, bh
    ), pairs AS (
      SELECT DISTINCT p.a AS doc_a, p.b AS doc_b
      FROM (SELECT unnest(flatten(list_transform(
              range(1, len(ids)), i -> list_transform(
                ids[i+1:], y -> {{'a': ids[i], 'b': y}})))) AS p
            FROM bucket
            WHERE len(ids) > 1 AND len(ids) <= {cap})
    ), mh AS (
      SELECT doc_a, doc_b,
             CAST({est} AS DOUBLE) / {k} AS est_jaccard
      FROM pairs
      JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
      JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
      WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    )"""


def _minhash_oracle() -> str:
    return f"""
    WITH {_minhash_cte()}
    SELECT doc_a, doc_b, est_jaccard FROM mh
    """


@register("minhash_dedup", oracle=_minhash_oracle(), headline=True)
def minhash_dedup(spark, sf_dir):
    """MinHash+LSH near-dup candidates, HASH-EXACT against a DuckDB
    oracle that replays the production xxhash64 family bit-for-bit
    (plans/duckdb_xxh): shingle string hash → 32 slot mins → 16 band
    hashes → capped buckets → pair estimates. Rows-only until round 8;
    recall vs exact Jaccard additionally asserted in tests/test_llm.py."""
    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    return MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2,
    ).transform(docs)


def _minhash_match_oracle(k: int = 32, split: int = 400,
                          threshold: float = 0.2,
                          cap: int = 1000,
                          dead: str | None = None) -> str:
    """Replays match_against_index over the shared _minhash_cte
    fragment: buckets are built from INDEX docs only (doc_id <
    split), the batch's band rows equi-join them, the maxBucketSize
    cap counts STORED members only (exactly the match-time
    semantics, which differ from transform's union-bucket cap), and
    signatures attach to the surviving (batch, indexed) pairs. The
    fragment's own bucket/pairs/mh CTEs go unreferenced and are
    pruned by DuckDB's optimizer. ``dead`` (a doc_id predicate)
    replays a pending TOMBSTONE set: masked ids leave the stored
    bucket members BEFORE the cap count — matching equals a fresh
    index over the survivors, the read-time-delete contract."""
    est = f"(len(list_filter(range(1, {k}+1), i -> sa[i] = sb[i])))"
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    # the unnest lives in its OWN CTE (mexp): DuckDB 1.0's binder
    # internal-errors on unnest inside a filtered derived table
    return f"""
    WITH {_minhash_cte(k=k, threshold=threshold, cap=cap)}, bucketi AS (
      SELECT j, bh, list_sort(list(DISTINCT doc_id)) AS ids
      FROM band WHERE {stored} GROUP BY j, bh
    ), mb AS (
      SELECT nb.doc_id AS doc_a, b2.ids AS bids
      FROM band nb JOIN bucketi b2 USING (j, bh)
      WHERE nb.doc_id >= {split} AND len(b2.ids) <= {cap}
    ), mexp AS (
      SELECT doc_a, unnest(bids) AS doc_b FROM mb
    ), mcand AS (
      SELECT DISTINCT doc_a, doc_b FROM mexp WHERE doc_a <> doc_b
    )
    SELECT doc_a, doc_b,
           CAST({est} AS DOUBLE) / {k} AS est_jaccard
    FROM mcand
    JOIN (SELECT doc_id AS doc_a, sig AS sa FROM sig) USING (doc_a)
    JOIN (SELECT doc_id AS doc_b, sig AS sb FROM sig) USING (doc_b)
    WHERE CAST({est} AS DOUBLE) / {k} >= {threshold}
    """


@register("minhash_match_indexed", oracle=_minhash_match_oracle())
def minhash_match_indexed(spark, sf_dir):
    """Incremental NEAR-dup against a PERSISTED MinHash index — the
    daily-ingest shape at 100 TB: the stored corpus (docs < 400) was
    shingled ONCE into signatures + banded bucket keys
    (MinHashLSHDeduplicator.save_index); the incoming batch (docs >=
    400) shingles only itself and equi-joins its bucket keys against
    the artifact, returning (batch doc, indexed doc, est_jaccard)
    pairs. Hot stored buckets are capped BEFORE the join fan-out by
    counting only the touched buckets. The oracle replays the exact
    match-time semantics (index-side buckets, stored-member cap)
    over the shared bit-exact xxhash64 fragment."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("minhash_match_appended", oracle=_minhash_match_oracle())
def minhash_match_appended(spark, sf_dir):
    """The APPEND half of the near-dup stored-index lifecycle under
    the driver's hash gate (round 14): the artifact is built in two
    installments — save_index over docs < 250, then append_to_index
    over 250 ≤ docs < 400 (appended docs shingle ALONE; their
    signature and bucket rows land as new files, no re-shingle of the
    existing store) — and the incoming batch (docs ≥ 400) screens
    against the GROWN index. The oracle is the same fresh-over-union
    replay the single-save lane uses: append == fresh build over the
    union is the family's documented contract, previously pinned only
    in pytest, now hash-checked through the driver."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 250), path)
    dd.append_to_index(
        docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("minhash_match_tombstoned",
          oracle=_minhash_match_oracle(dead="doc_id % 5 = 0"))
def minhash_match_tombstoned(spark, sf_dir):
    """The DELETE half of the stored-index lifecycle under the
    driver's hash gate (round 12): the stored corpus (docs < 400)
    tombstones every 5th doc (a takedown batch — metadata-only, no
    store rewrite), then the incoming batch screens against the
    index. Tombstoned docs are masked from the bucket store BEFORE
    the hot-bucket cap count, so matching equals a fresh index over
    the survivors — which is exactly what the oracle replays (the
    shared xxhash64 fragment with the dead ids excluded from the
    stored side). save_index clears stale tombstones on overwrite,
    so the query is hermetic across repeated driver runs."""
    import os

    from mmlspark_spark.llm import MinHashLSHDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"minhash_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = docs.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


def _dedup_recall_oracle(n: int = 5, threshold: float = 0.2) -> str:
    """Composes the two proven replays — the FULL MinHash pipeline
    (_minhash_cte, bit-exact xxhash64) and the exact word-5-gram
    Jaccard truth — and counts candidate coverage. Only membership
    reaches the output (true_pairs, hit_pairs, recall), so this pins
    that both pipelines produce identical PAIR SETS on both engines:
    the property every dedup recall claim rests on. CTE names in the
    exact chain are prefixed ex- (the minhash fragment owns t/g/sig/
    band/bucket/pairs)."""
    return f"""
    WITH {_minhash_cte()}, extoks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), exidx AS (
      SELECT doc_id, w, unnest(range(1, greatest(len(w)-{n - 2}, 1)))
               AS i
      FROM extoks
    ), exsh AS (
      SELECT DISTINCT doc_id,
             array_to_string(w[i:i+{n - 1}], ' ') AS shingle
      FROM exidx
    ), excnt AS (
      SELECT doc_id, count(*) AS nn FROM exsh GROUP BY 1
    ), expairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
      FROM exsh a JOIN exsh b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ), ex AS (
      SELECT doc_a, doc_b
      FROM expairs
      JOIN excnt ca ON ca.doc_id = doc_a
      JOIN excnt cb ON cb.doc_id = doc_b
      WHERE CAST(inter AS DOUBLE) / (ca.nn + cb.nn - inter)
            >= {threshold}
    ), hit AS (
      SELECT ex.doc_a FROM ex
      JOIN mh ON mh.doc_a = ex.doc_a AND mh.doc_b = ex.doc_b
    )
    SELECT CAST((SELECT count(*) FROM ex) AS BIGINT) AS true_pairs,
           CAST((SELECT count(*) FROM hit) AS BIGINT) AS hit_pairs,
           round(CAST((SELECT count(*) FROM hit) AS DOUBLE)
                 / greatest((SELECT count(*) FROM ex), 1), 6) AS recall
    """


@register("dedup_recall", oracle=_dedup_recall_oracle())
def dedup_recall(spark, sf_dir):
    """Candidate recall of MinHash-LSH against exact 5-gram Jaccard
    truth (threshold 0.2) — the evaluation loop every dedup deployment
    runs (tune bands/hashes until candidate recall clears the bar),
    as one distributed job: both pipelines run, the overlap is a
    semi-join, and the oracle replays BOTH pair sets (bit-exact
    xxhash64 MinHash + exact-Jaccard SQL), so the recall number is
    cross-engine-proven, not just locally asserted (the pytest recall
    check in tests/test_llm.py becomes a driver-checked artifact)."""
    from mmlspark_spark.core.cache import propagate_intermediates
    from mmlspark_spark.llm import MinHashLSHDeduplicator, ngram_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    mh = MinHashLSHDeduplicator(
        idCol="doc_id", textCol="text", shingleSize=5,
        numHashes=32, bands=16, threshold=0.2,
    ).transform(docs).select("doc_a", "doc_b")
    ex = (ngram_jaccard_pairs(docs, "doc_id", "text", n=5)
          .filter(F.col("jaccard") >= 0.2).select("doc_a", "doc_b"))
    hits = (ex.join(mh, ["doc_a", "doc_b"], "left_semi")
            .agg(F.count("*").alias("hit_pairs")))
    out = (ex.agg(F.count("*").alias("true_pairs"))
           .crossJoin(hits)
           .select(F.col("true_pairs").cast("bigint").alias("true_pairs"),
                   F.col("hit_pairs").cast("bigint").alias("hit_pairs"),
                   F.round(F.col("hit_pairs").cast("double")
                           / F.greatest(F.col("true_pairs"), F.lit(1)),
                           6).alias("recall")))
    return propagate_intermediates(ex, propagate_intermediates(mh, out))


def _hamming_band_pairs_sql(bands: int, maxHamming: int, cap: int) -> str:
    """Shared SQL tail replaying ``dedup._hamming_band_pairs`` —
    expects a prior CTE ``fp(doc_id, sh BIGINT)``. Used by BOTH the
    simhash_dedup and image_dhash_dedup oracles; a private copy in
    each would let the band/cap/tie-break replay drift (the fold_sum
    lesson). Equal-width chunks only (64 % bands == 0)."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64

    assert 64 % bands == 0, "oracle assumes equal-width chunks"
    w = 64 // bands
    return f"""band AS (
      SELECT doc_id, sh, j,
             (({to_u64("sh")})::UBIGINT >> ({w}*j)) & {(1 << w) - 1}
               AS chunk
      FROM (SELECT doc_id, sh, unnest(range(0, {bands})) AS j FROM fp)
    ), bucket AS (
      SELECT j, chunk,
             list({{'i': doc_id, 'h': sh}} ORDER BY doc_id) AS ms
      FROM band GROUP BY j, chunk
    ), pairs AS (
      SELECT DISTINCT p.a AS doc_a, p.b AS doc_b, p.x AS x
      FROM (SELECT unnest(flatten(list_transform(
              range(1, len(ms)), i -> list_transform(
                ms[i+1:], y -> {{'a': ms[i].i, 'b': y.i,
                                 'x': xor(ms[i].h, y.h)}})))) AS p
            FROM bucket
            WHERE len(ms) > 1 AND len(ms) <= {cap})
    )
    SELECT doc_a, doc_b, CAST(bit_count(x) AS INTEGER) AS hamming
    FROM pairs WHERE bit_count(x) <= {maxHamming}
    """


def _simhash_fp_cte() -> str:
    """The SimHash fingerprint WITH-fragment ending in CTE
    ``fp(doc_id, sh)`` — Java-\\s tokens (duplicates COUNT — the vote
    aggregate is over the raw token list), per-token xxhash64 (hashed
    once per distinct word, joined back), 64 sign-votes,
    two's-complement assembly (bit 63 negative). Empty-token
    documents fingerprint to 0 and participate (only NULL text is
    excluded), exactly like the Spark path. Shared by simhash_dedup
    and simhash_match_indexed so the fingerprint replay cannot
    drift."""
    from mmlspark_spark.plans.duckdb_xxh import xxh64_str

    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\x0B\\f\\r]+'),
               x -> x <> '') AS toks
      FROM documents WHERE text IS NOT NULL
    ), tok AS (
      SELECT doc_id, unnest(toks) AS w FROM t
    ), wh AS (
      SELECT w, ({xxh64_str("w", u="ze")})::UBIGINT AS hu
      FROM (SELECT DISTINCT w FROM tok)
    ), votes AS (
      SELECT doc_id, j,
             sum(CASE WHEN ((hu >> j) & 1) = 1 THEN 1 ELSE -1 END) AS v
      FROM (SELECT doc_id, hu, unnest(range(0, 64)) AS j
            FROM tok JOIN wh USING (w))
      GROUP BY doc_id, j
    ), fp AS (
      SELECT doc_id, CAST(sum(CASE WHEN v <= 0 THEN 0::HUGEINT
               WHEN j = 63 THEN -9223372036854775808::HUGEINT
               ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM votes GROUP BY doc_id
      UNION ALL
      SELECT doc_id, 0::BIGINT FROM t WHERE len(toks) = 0
    )"""


def _simhash_oracle(bands: int = 4, maxHamming: int = 10,
                    cap: int = 1000) -> str:
    """DuckDB replay of the FULL SimHashDeduplicator pipeline: the
    shared fingerprint fragment + 16-bit band chunks, capped buckets,
    upper-triangle pairs and the Hamming filter."""
    return f"""
    WITH {_simhash_fp_cte()}, {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


def _simhash_match_oracle(bands: int = 4, maxHamming: int = 10,
                          split: int = 400, cap: int = 1000,
                          dead: str | None = None) -> str:
    """Replays SimHashDeduplicator.match_against_index: buckets from
    INDEX docs only (doc_id < split), batch band rows equi-join them,
    stored-member cap, Hamming filter on the xor — match-time
    semantics over the shared fingerprint fragment. The unnest lives
    in its own CTE (the DuckDB 1.0 binder lesson). ``dead`` (a doc_id
    predicate) replays a pending TOMBSTONE set: masked ids leave the
    stored bucket members BEFORE the cap count — matching equals a
    fresh index over the survivors (the read-time-delete contract,
    same as _minhash_match_oracle's)."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64

    assert 64 % bands == 0
    w = 64 // bands
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    return f"""
    WITH {_simhash_fp_cte()}, band AS (
      SELECT doc_id, sh, j,
             (({to_u64("sh")})::UBIGINT >> ({w}*j)) & {(1 << w) - 1}
               AS chunk
      FROM (SELECT doc_id, sh, unnest(range(0, {bands})) AS j FROM fp)
    ), bucketi AS (
      SELECT j, chunk,
             list({{'i': doc_id, 'h': sh}} ORDER BY doc_id) AS ms
      FROM band WHERE {stored} GROUP BY j, chunk
    ), mb AS (
      SELECT nb.doc_id AS doc_a, nb.sh AS sha, b2.ms AS bms
      FROM band nb JOIN bucketi b2 USING (j, chunk)
      WHERE nb.doc_id >= {split} AND len(b2.ms) <= {cap}
    ), mexp AS (
      SELECT doc_a, sha, unnest(bms) AS m FROM mb
    )
    SELECT DISTINCT doc_a, m.i AS doc_b,
           CAST(bit_count(xor(sha, m.h)) AS INTEGER) AS hamming
    FROM mexp
    WHERE doc_a <> m.i AND bit_count(xor(sha, m.h)) <= {maxHamming}
    """


@register("simhash_match_indexed", oracle=_simhash_match_oracle())
def simhash_match_indexed(spark, sf_dir):
    """Incremental SimHash near-dup against a PERSISTED fingerprint
    index — the cheapest stored index in the engine (16 bytes/doc;
    band chunks are bit-slices derived free at match time): the
    incoming batch (docs >= 400) fingerprints map-side and its chunk
    keys equi-join the stored corpus's (docs < 400), hot stored
    buckets capped before the fan-out, Hamming filter on the xor.
    Oracle replays the match-time semantics over the shared
    fingerprint fragment."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("simhash_match_appended", oracle=_simhash_match_oracle())
def simhash_match_appended(spark, sf_dir):
    """The APPEND half of the FingerprintIndexMixin lifecycle under
    the driver's hash gate (round 15 — the minhash_match_appended
    pattern on the fingerprint family, covering the shared mixin for
    all four 64-bit-fingerprint dedupers: SimHash text, image dHash,
    audio Haitsma-Kalker, video dHash): the artifact is built in two
    installments — save_index over docs < 250, then append_to_index
    over 250 ≤ docs < 400 (appended docs fingerprint ALONE,
    map-side; their rows land as new parquet files, no re-read of
    the existing store) — and the incoming batch (docs ≥ 400)
    screens against the GROWN index. Oracle is the same
    fresh-over-union replay the single-save lane uses: append ==
    fresh build over the union is the mixin's contract, previously
    pinned only in pytest."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_app_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(docs.filter(F.col("doc_id") < 250), path)
    dd.append_to_index(
        docs.filter((F.col("doc_id") >= 250) & (F.col("doc_id") < 400)),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


@register("simhash_match_tombstoned",
          oracle=_simhash_match_oracle(dead="doc_id % 5 = 0"))
def simhash_match_tombstoned(spark, sf_dir):
    """The DELETE half of the SimHash stored-index lifecycle under
    the driver's hash gate (round 13 — the minhash_match_tombstoned
    pattern on the fingerprint family): the stored corpus (docs <
    400) tombstones every 5th doc (metadata-only takedown), then the
    incoming batch screens against the index. Tombstoned
    fingerprints are masked BEFORE banding, so they neither surface
    as doc_b nor count toward the hot-bucket cap — matching equals a
    fresh index over the survivors, exactly what the oracle replays
    (dead ids excluded from the stored side of the shared
    fingerprint fragment). save_index clears stale tombstones on
    overwrite, so repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    dd = SimHashDeduplicator(idCol="doc_id", textCol="text",
                             bands=4, maxHammingDistance=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"simhash_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = docs.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path),
                                  docs.filter(F.col("doc_id") >= 400))


def _image_dhash_oracle(bands: int = 4, maxHamming: int = 6,
                        cap: int = 1000) -> str:
    """Replays image_dhash_dedup end-to-end: the deterministic pixel
    synthesis (chained xxhash64 of (group, pixel-index) — recomputed
    bit-exact), the odd-variant brightness shift with its 255 clip,
    the 64 dHash comparisons, two's-complement assembly, and the
    shared banded-Hamming tail."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="qa")
    pix = f"(({xxh64_long(to_u64('r*9+c'), 'gh', u='qb')}) % 256)"
    return f"""
    WITH d AS (
      SELECT doc_id, doc_id % 10 AS grp, doc_id // 10 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, v, {inner} AS gh FROM d
    ), px AS (
      SELECT doc_id, list_transform(range(0, 8), r ->
               list_transform(range(0, 9), c ->
                 {pix} + CASE WHEN (r*9+c + v) % 9 = 0
                              THEN 17 * v ELSE 0 END)) AS g
      FROM gh
    ), fp AS (
      SELECT doc_id, CAST(sum(
               CASE WHEN g[j//8 + 1][j%8 + 1] <= g[j//8 + 1][j%8 + 2]
                      THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM (SELECT doc_id, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY doc_id
    ), {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


@register("image_dhash_dedup", oracle=_image_dhash_oracle())
def image_dhash_dedup(spark, sf_dir):
    """Perceptual-hash image dedup (ImageDHashDeduplicator, pure-
    Catalyst grid lane): synthetic 8×9 grayscale grids — pixel =
    pmod(xxhash64(doc_id%10, pixel_index), 256), so every group of 10
    residues shares one base image, and variant v = doc_id div 10
    perturbs ~8 stagger-positioned pixels by 17·v — near variants stay
    within the Hamming ≤ 6 threshold, far variants collide in a band
    (some chunk is untouched) but FAIL the threshold, so both the
    candidate and the filter stage are exercised non-vacuously.
    Fingerprint → shared banded buckets → capped pairs → Hamming
    filter, all replayed hash-exact by the oracle. Map-side except
    the bucket groupBy."""
    from mmlspark_spark.llm import ImageDHashDeduplicator

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 10).cast("long")
    v = F.expr("doc_id div 10")

    def pix(r, c):
        p = F.pmod(F.xxhash64(grp, F.lit(r * 9 + c).cast("long")),
                   F.lit(256)).cast("int")
        return p + F.when((F.lit(r * 9 + c) + v) % 9 == 0,
                          (17 * v).cast("int")).otherwise(F.lit(0))

    grid = F.array(*[F.array(*[pix(r, c) for c in range(9)])
                     for r in range(8)])
    planted = docs.select("doc_id", grid.alias("gray"))
    return ImageDHashDeduplicator(
        idCol="doc_id", imageCol="gray", bands=4,
        maxHammingDistance=6).transform(planted)


def _audio_fp_oracle(bands: int = 4, maxHamming: int = 6,
                     cap: int = 1000) -> str:
    """Replays audio_fingerprint_dedup end-to-end: the deterministic
    energy-grid synthesis (chained xxhash64 of (group, cell-index),
    power-of-two base modulus so signed pmod and unsigned mod agree),
    the variant gain perturbation, the 64 Haitsma-Kalker second-order
    difference signs, two's-complement assembly, and the shared
    banded-Hamming tail."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="aa")
    cell = f"(({xxh64_long(to_u64('t*9+f'), 'gh', u='ab')}) % 1024)"
    d = ("(g[j//8 + 2][j%8 + 1] - g[j//8 + 2][j%8 + 2])"
         " - (g[j//8 + 1][j%8 + 1] - g[j//8 + 1][j%8 + 2])")
    return f"""
    WITH d AS (
      SELECT doc_id, doc_id % 10 AS grp, doc_id // 10 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, v, {inner} AS gh FROM d
    ), px AS (
      SELECT doc_id, list_transform(range(0, 9), t ->
               list_transform(range(0, 9), f ->
                 CAST({cell} AS DOUBLE)
                 + CASE WHEN (t*9+f + 5*v) % 17 = 0
                        THEN CAST(61 * v AS DOUBLE)
                        ELSE 0.0 END)) AS g
      FROM gh
    ), fp AS (
      SELECT doc_id, CAST(sum(
               CASE WHEN {d} <= 0 THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS sh
      FROM (SELECT doc_id, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY doc_id
    ), {_hamming_band_pairs_sql(bands, maxHamming, cap)}"""


@register("audio_fingerprint_dedup", oracle=_audio_fp_oracle())
def audio_fingerprint_dedup(spark, sf_dir):
    """Perceptual audio dedup (AudioFingerprintDeduplicator, pure-
    Catalyst grid lane): synthetic 9×9 time×band energy grids —
    cell = xxhash64(doc_id%10, cell_index) & 1023 as a double, so
    every group of 10 residues shares one base recording, and
    variant v = doc_id div 10 adds a 61·v gain bump at ~5 stagger-
    positioned cells — near variants stay within Hamming ≤ 6, far
    variants band-collide but FAIL the threshold (1.4k detected vs
    1.1k collide-but-filtered at sf0.01), so both the candidate and
    filter stages are exercised non-vacuously. Haitsma-Kalker
    second-order-difference fingerprint → shared banded buckets →
    capped pairs → Hamming filter, all replayed hash-exact. Map-side
    except the bucket groupBy."""
    from mmlspark_spark.llm import AudioFingerprintDeduplicator

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 10).cast("long")
    v = F.expr("doc_id div 10")

    def cell(t, f):
        idx = t * 9 + f
        e = (F.xxhash64(grp, F.lit(idx).cast("long"))
             .bitwiseAND(F.lit(1023)).cast("double"))
        return e + F.when((F.lit(idx) + 5 * v) % 17 == 0,
                          (61 * v).cast("double")).otherwise(F.lit(0.0))

    grid = F.array(*[F.array(*[cell(t, f) for f in range(9)])
                     for t in range(9)])
    planted = docs.select("doc_id", grid.alias("energy"))
    return AudioFingerprintDeduplicator(
        idCol="doc_id", audioCol="energy", bands=4,
        maxHammingDistance=6).transform(planted)


def _video_fp_cte() -> str:
    """The shared video-fingerprint replay fragment (CTEs ``d`` →
    ``docfh`` → ``sizes``): deterministic per-frame 8×9 grids
    (chained xxhash64 of (group, frame·72 + cell)), the dHash bit
    rule and two's-complement assembly PER FRAME, distinct frame-hash
    sets per doc and the per-doc size ledger. Reused by
    video_dhash_dedup (full pair stage) and video_match_indexed
    (batch-vs-stored stage) so the fingerprint replay cannot
    diverge."""
    from mmlspark_spark.plans.duckdb_xxh import to_u64, xxh64_long

    inner = xxh64_long(to_u64("grp"), "42::HUGEINT", u="va")
    pix = (f"(({xxh64_long(to_u64('f*72 + r*9 + c'), 'gh', u='vb')})"
           f" % 256)")
    return f"""d AS (
      SELECT doc_id, doc_id % 25 AS grp, doc_id // 25 AS v
      FROM documents
    ), gh AS (
      SELECT doc_id, grp, v, {inner} AS gh FROM d
    ), gf AS (
      SELECT DISTINCT grp, gh, v + i AS f
      FROM (SELECT grp, gh, v, unnest(range(0, 8)) AS i FROM gh)
    ), px AS (
      SELECT grp, f, list_transform(range(0, 8), r ->
               list_transform(range(0, 9), c -> {pix})) AS g
      FROM gf
    ), fp AS (
      SELECT grp, f, CAST(sum(
               CASE WHEN g[j//8 + 1][j%8 + 1] <= g[j//8 + 1][j%8 + 2]
                      THEN 0::HUGEINT
                    WHEN j = 63 THEN -9223372036854775808::HUGEINT
                    ELSE (1::HUGEINT << j) END) AS BIGINT) AS fh
      FROM (SELECT grp, f, g, unnest(range(0, 64)) AS j FROM px)
      GROUP BY grp, f
    ), docfh AS (
      SELECT DISTINCT h.doc_id, p.fh
      FROM gh h JOIN fp p
        ON p.grp = h.grp AND p.f BETWEEN h.v AND h.v + 7
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM docfh GROUP BY doc_id
    )"""


def _video_dhash_oracle(minOverlap: float = 0.7) -> str:
    """Replays video_dhash_dedup end-to-end over the shared
    fingerprint fragment, then the containment-overlap pair stage.
    The oracle may self-join (declarative replay); the Spark path
    uses capped hash buckets instead. All arithmetic is integer or
    dyadic-rational (matches / 8), so the compare is exact."""
    return f"""
    WITH {_video_fp_cte()}, pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS matches
      FROM docfh a JOIN docfh b
        ON a.fh = b.fh AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, matches,
           CAST(matches AS DOUBLE) / least(na.n, nb.n) AS overlap
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(matches AS DOUBLE) / least(na.n, nb.n) >= {minOverlap}
    """


def _planted_clips(spark, sf_dir):
    """The shared synthetic-clip frame: every doc is an 8-frame clip
    cut from its group's virtual reel at offset v = doc_id div 25 —
    adjacent offsets share 7 of 8 frames (overlap 0.875), two apart
    share 6 (0.75), three+ fall below the 0.7 containment threshold,
    so near, boundary and rejected pairs all occur. Frame pixels are
    chained xxhash64 of (group, frame·72 + cell) mod 256 (power of
    two: signed pmod == unsigned mod) — the Spark twin of
    :func:`_video_fp_cte`'s pixel synthesis."""
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    grp = (F.col("doc_id") % 25).cast("long")
    v = F.expr("doc_id div 25")

    def frame(f):
        def cell(r, c):
            return F.pmod(F.xxhash64(grp, f * 72 + F.lit(r * 9 + c)),
                          F.lit(256)).cast("long")
        return F.array(*[F.array(*[cell(r, c) for c in range(9)])
                         for r in range(8)])

    frames = F.transform(F.sequence(v, v + F.lit(7)), frame)
    return docs.select("doc_id", frames.alias("clip"))


@register("video_dhash_dedup", oracle=_video_dhash_oracle())
def video_dhash_dedup(spark, sf_dir):
    """Frame-sampled video near-dup (VideoDHashDeduplicator, pure-
    Catalyst grid lane) over the shared synthetic clips: per-frame
    dHash → distinct-set explode → capped frame-hash buckets → pair
    counts → containment filter, replayed exactly (all values integer
    or dyadic)."""
    from mmlspark_spark.llm import VideoDHashDeduplicator

    return VideoDHashDeduplicator(
        idCol="doc_id", videoCol="clip",
        minOverlap=0.7).transform(_planted_clips(spark, sf_dir))


def _video_match_oracle(minOverlap: float = 0.7, split: int = 400,
                        cap: int = 1000,
                        dead: str | None = None) -> str:
    """Replays VideoDHashDeduplicator.match_against_index over the
    shared fingerprint fragment: stored docs are doc_id < split,
    the batch is doc_id >= split; frame hashes held by more than
    ``cap`` STORED docs are dropped before the pair stage (the
    stored-member hot-frame cap — a title card must not explode the
    fan-out); matches count shared distinct frame hashes; containment
    overlap uses the batch's own sizes and the stored ledger.
    ``dead`` (a doc_id predicate) replays a pending TOMBSTONE set:
    masked docs leave the stored frames, the hot-frame cap count AND
    the size ledger — matching equals a fresh index over the
    survivors (the read-time-delete contract)."""
    stored = f"doc_id < {split}" + (f" AND NOT ({dead})" if dead
                                    else "")
    b_stored = (f"b.doc_id < {split}"
                + (f" AND NOT ({dead.replace('doc_id', 'b.doc_id')})"
                   if dead else ""))
    return f"""
    WITH {_video_fp_cte()}, okfh AS (
      SELECT fh FROM docfh WHERE {stored}
      GROUP BY fh HAVING count(*) <= {cap}
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS matches
      FROM docfh a
      JOIN okfh o ON o.fh = a.fh
      JOIN docfh b ON b.fh = a.fh
      WHERE a.doc_id >= {split} AND {b_stored}
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, matches,
           CAST(matches AS DOUBLE) / least(na.n, nb.n) AS overlap
    FROM pairs
    JOIN sizes na ON na.doc_id = doc_a
    JOIN sizes nb ON nb.doc_id = doc_b
    WHERE CAST(matches AS DOUBLE) / least(na.n, nb.n) >= {minOverlap}
    """


@register("video_match_indexed", oracle=_video_match_oracle())
def video_match_indexed(spark, sf_dir):
    """Incremental video near-dup against a PERSISTED per-frame dHash
    index (round 12 — the LAST near-dup family to get the stored
    lifecycle): docs < 400 save as the index (frames store,
    fh-clustered, + per-doc size ledger), the batch (docs >= 400)
    frame-hashes map-side, semi-joins the store down to touched
    rows, hot stored frame hashes are capped before the fan-out, and
    containment overlap reads the stored ledger — the stored corpus
    is never re-hashed or re-aggregated. Oracle replays the
    match-time semantics over the shared fingerprint fragment."""
    import os

    from mmlspark_spark.llm import VideoDHashDeduplicator

    planted = _planted_clips(spark, sf_dir)
    dd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                minOverlap=0.7,
                                maxDocsPerFrameHash=1000)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"video_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(planted.filter(F.col("doc_id") < 400), path)
    return dd.match_against_index(
        dd.load_index(spark, path),
        planted.filter(F.col("doc_id") >= 400))


@register("video_match_tombstoned",
          oracle=_video_match_oracle(dead="doc_id % 5 = 0"))
def video_match_tombstoned(spark, sf_dir):
    """The DELETE half of the video stored-index lifecycle under the
    driver's hash gate (round 13): the stored clips (docs < 400)
    tombstone every 5th doc (metadata-only takedown), then the
    incoming batch screens against the index. Tombstoned docs are
    masked from the frame store, the hot-frame cap count AND the
    size ledger — matching equals a fresh index over the survivors,
    exactly what the oracle replays (dead docs excluded from the
    stored side of the frame-synthesis + dHash + set-overlap
    fragment). save_index clears stale tombstones on overwrite, so
    repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm import VideoDHashDeduplicator

    planted = _planted_clips(spark, sf_dir)
    dd = VideoDHashDeduplicator(idCol="doc_id", videoCol="clip",
                                minOverlap=0.7,
                                maxDocsPerFrameHash=1000)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"video_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = planted.filter(F.col("doc_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(
        dd.load_index(spark, path),
        planted.filter(F.col("doc_id") >= 400))


def _dsir_oracle(B: int = 1024, k: int = 150, seed: int = 7) -> str:
    """Replays the FULL DSIR pipeline (llm/selection.py) end to end:
    pinned tokenization, unigram+bigram grams in position order,
    per-DISTINCT-gram xxhash64 → power-of-two bucket (unsigned mod ==
    Spark's signed bit-AND), smoothed target/raw log-ratio table, the
    per-document left-fold score in gram order (list_reduce prepend-0
    — the fold_sum order contract), the seeded Gumbel key from
    chained xxhash64(doc_id, seed), and the rounded-key top-k. Scores
    round to 6dp BEFORE entering the key so ulp-level ln() drift
    between libm and Java Math.log cannot flip selection."""
    from mmlspark_spark.plans.duckdb_xxh import (
        to_s64,
        to_u64,
        xxh64_long,
        xxh64_str,
    )

    h1 = xxh64_long(to_u64("doc_id"), "42::HUGEINT", u="dga")
    h2 = xxh64_long(f"{seed}::HUGEINT", "h1", u="dgb")
    # two-sided clamp mirroring DSIRModel._gumbel_key exactly:
    # greatest(…, 2⁻⁶⁴) for h = −2⁶³ (u = 0 → −ln(−ln 0) = −inf) and
    # least(…, 1 − 2⁻⁵³) for the 512 h values near +2⁶³ whose
    # int64→double cast rounds to u = 1.0 (Spark: +inf key; DuckDB:
    # ln(0) raises — the clamp is what keeps the oracle runnable)
    u01 = (f"least(greatest(CAST(({to_s64('h2v')}) AS DOUBLE)"
           f"/18446744073709551616.0 + 0.5,"
           f" 1.0/18446744073709551616.0),"
           f" 1.0 - 1.0/9007199254740992.0)")
    return f"""
    WITH t AS (
      SELECT doc_id, lang, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), grams AS (
      SELECT doc_id, lang,
             tk || list_transform(range(1, len(tk)),
                                  i -> tk[i] || ' ' || tk[i+1]) AS gs
      FROM t
    ), gx AS (
      SELECT doc_id, lang, j, gs[j+1] AS g
      FROM (SELECT doc_id, lang, gs, unnest(range(0, len(gs))) AS j
            FROM grams)
    ), gh AS (
      SELECT g,
             CAST(({to_u64(xxh64_str("g", u="dg"))}) % {B} AS BIGINT)
               AS b
      FROM (SELECT DISTINCT g FROM gx)
    ), gb AS (
      SELECT doc_id, lang, j, b FROM gx JOIN gh USING (g)
    ), tcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb
      WHERE lang = 'en' GROUP BY b
    ), rcnt AS (
      SELECT b, CAST(count(*) AS BIGINT) AS c FROM gb GROUP BY b
    ), tot AS (
      SELECT (SELECT COALESCE(CAST(sum(c) AS BIGINT), 0) FROM tcnt)
               AS tt,
             (SELECT COALESCE(CAST(sum(c) AS BIGINT), 0) FROM rcnt)
               AS rt
    ), fullb AS (
      SELECT r.b AS b, COALESCE(tc.c, 0) AS tc, COALESCE(rc.c, 0) AS rc
      FROM (SELECT unnest(range(0, {B})) AS b) r
      LEFT JOIN tcnt tc ON tc.b = r.b
      LEFT JOIN rcnt rc ON rc.b = r.b
    ), lrarr AS (
      SELECT list(ln((tc + 1.0) / (CAST(tt AS DOUBLE) + {float(B)}))
                  - ln((rc + 1.0) / (CAST(rt AS DOUBLE) + {float(B)}))
                  ORDER BY b) AS arr
      FROM fullb CROSS JOIN tot
    ), doclist AS (
      SELECT doc_id, list(b ORDER BY j) AS bs FROM gb GROUP BY doc_id
    ), scored AS (
      SELECT t.doc_id,
             list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(COALESCE(dl.bs, CAST([] AS BIGINT[])),
                              bb -> arr[bb + 1])),
               (a2, b2) -> a2 + b2) AS score
      FROM t LEFT JOIN doclist dl USING (doc_id) CROSS JOIN lrarr
    ), g2 AS (
      SELECT doc_id, round(score, 6) AS dsir_score, ({h2}) AS h2v
      FROM (SELECT doc_id, score, ({h1}) AS h1 FROM scored)
    )
    SELECT doc_id, dsir_score,
           round(dsir_score / 1.0 - ln(-ln({u01})), 6) AS gumbel_key
    FROM g2
    ORDER BY gumbel_key DESC, doc_id LIMIT {k}
    """


@register("dsir_select", oracle=_dsir_oracle())
def dsir_select(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023, arXiv:2302.03169): fit
    hashed unigram+bigram importance weights of the English subset
    against the whole pool, score every document map-side via the
    one-row broadcast log-ratio array, and Gumbel-top-k resample 150
    docs without replacement. FIT shuffles are bucket-bounded (1024),
    SCORING is zero-shuffle (single-row BNLJ broadcast + per-doc
    fold), SELECTION is TakeOrderedAndProject — no stage touches
    corpus-sized state, so the plan is unchanged at 100 TB. Keys and
    scores round to 6dp before ranking so the driver hash and the
    member set are float-drift-proof."""
    from mmlspark_spark.llm import DSIRSelector

    docs = _t(spark, sf_dir, "documents")
    sel = DSIRSelector(idCol="doc_id", textCol="text", buckets=1024,
                       seed=7)
    model = sel.fit(docs.filter(F.col("lang") == "en"), docs)
    return (model.resample(docs, k=150)
            .select("doc_id", F.col("dsir_score"), "gumbel_key"))


@register("simhash_dedup", oracle=_simhash_oracle())
def simhash_dedup(spark, sf_dir):
    """SimHash fingerprint near-dup candidates, HASH-EXACT against a
    DuckDB oracle replaying the production xxhash64 family bit-for-bit
    (plans/duckdb_xxh): per-token hashes → 64 sign votes → fingerprint
    → 16-bit band buckets → capped pairs → Hamming filter. Rows-only
    until round 8."""
    from mmlspark_spark.llm import SimHashDeduplicator

    docs = _t(spark, sf_dir, "documents")
    return SimHashDeduplicator(
        idCol="doc_id", textCol="text", bands=4, maxHammingDistance=10
    ).transform(docs)


@register(
    "knn_bruteforce",
    oracle="""
    SELECT query_id, neighbor_id, sim, rk FROM (
      SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
             round(list_cosine_similarity(q.embedding::DOUBLE[],
                                          d.embedding::DOUBLE[]), 6) AS sim,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.embedding::DOUBLE[],
                                               d.embedding::DOUBLE[]) DESC,
                        d.vec_id
             ) AS rk
      FROM embeddings q JOIN embeddings d ON q.vec_id < 5 AND d.vec_id <> q.vec_id
    ) WHERE rk <= 10
    """,
    headline=True,
)
def knn_bruteforce(spark, sf_dir):
    """Exact top-10 cosine neighbors for the first 5 query vectors —
    brute-force baseline of the similarity-search stack."""
    from mmlspark_spark.llm import BruteForceKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    # numpy = the scale path (broadcast queries, stream corpus,
    # per-partition BLAS partial top-k); measured 2x the expr path at
    # sf0.1 (0.45 s vs 0.95 s) and verified repr-exact vs the oracle
    out = BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10,
                        method="numpy").search(emb, q)
    return out.select(
        "query_id", "neighbor_id",
        F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"),
    )


def _knn_lsh_oracle(numPlanes: int = 16, bands: int = 8, k: int = 10,
                    dim: int = 64, seed: int = 42) -> str:
    """Replays LSHKNN end-to-end: the SAME seeded numpy hyperplanes
    (regenerated here at import time and inlined as double literals —
    both sides call ``default_rng(seed).standard_normal`` so they can
    never drift), sign-bit signatures with the identical left-fold
    summation order, band chunks, bucket-join candidates, exact cosine
    (separate dot/norm² folds — bit-identical to the one-pass struct
    accumulator because each accumulator adds in element order) and
    the (sim DESC, neighbor_id) top-k window."""
    import numpy as np

    planes = np.random.default_rng(seed).standard_normal((numPlanes, dim))
    pls = "[" + ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in planes) + "]::DOUBLE[][]"
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql, fold_sum

    r = numPlanes // bands
    assert r == 2, "chunk expr below unrolls exactly r=2 bits"

    def fold(term: str) -> str:
        return fold_sum(term, dim)

    def bit(plane_ix: str) -> str:
        return (f"(CASE WHEN {fold(f'v[i2] * pls[{plane_ix}][i2]')} > 0 "
                f"THEN 1 ELSE 0 END)")

    return f"""
    WITH pl AS (SELECT {pls} AS pls),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), sig AS (
      SELECT vec_id, v,
             list_transform(range(0, {bands}),
               b -> {bit('2*b+1')} + 2 * {bit('2*b+2')}) AS chunks
      FROM e, pl
    ), band AS (
      SELECT vec_id, unnest(chunks) AS chunk,
             unnest(range(0, {bands})) AS band
      FROM sig
    ), cand AS (
      SELECT DISTINCT q.vec_id AS query_id, d.vec_id AS neighbor_id
      FROM band d JOIN band q
        ON d.band = q.band AND d.chunk = q.chunk
      WHERE q.vec_id < 5 AND d.vec_id <> q.vec_id
    ), scored AS (
      SELECT query_id, neighbor_id,
             {cosine_sql("eq.v", "ed.v", dim)} AS sim
      FROM cand
      JOIN e eq ON eq.vec_id = query_id
      JOIN e ed ON ed.vec_id = neighbor_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= {k}
    """


@register("knn_lsh", oracle=_knn_lsh_oracle())
def knn_lsh(spark, sf_dir):
    """LSH-bucketed approximate KNN, HASH-EXACT against a DuckDB
    oracle replaying the seeded hyperplanes, signature bits, bucket
    join and exact-cosine top-k bit-for-bit (rows-only before round
    8; recall vs brute force additionally asserted in
    tests/test_llm.py)."""
    from mmlspark_spark.llm import LSHKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = LSHKNN(idCol="vec_id", vecCol="embedding", k=10,
                 numPlanes=16, bands=8).search(emb, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"))


@register("knn_lsh_indexed", oracle=_knn_lsh_oracle())
def knn_lsh_indexed(spark, sf_dir):
    """LSH ANN from a PERSISTED signature index (round 12 — the last
    ANN family to gain the stored lifecycle): the corpus's band rows
    (12 bytes each, vectors split into their own store) persist once;
    a search signatures only the queries, broadcasts them onto the
    stored band rows, and the exact-cosine rerank joins stored
    vectors once per candidate. Results are identical to the
    in-memory lane — the oracle is knn_lsh's seeded-plane replay
    verbatim, so a hash match proves the save/load round-trip is
    lossless."""
    import os

    from mmlspark_spark.llm import LSHKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    lsh = LSHKNN(idCol="vec_id", vecCol="embedding", k=10,
                 numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"lsh_{os.path.basename(sf_dir.rstrip('/'))}")
    lsh.save_index(emb, path)
    out = lsh.search_with_index(lsh.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register(
    "embedding_stats",
    oracle="""
    SELECT label, count(*) AS n,
           round(avg(list_aggregate(list_transform(embedding::DOUBLE[],
                 x -> x * x), 'sum')), 6) AS avg_sq_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_stats(spark, sf_dir):
    """Per-label embedding norms — array aggregation expressions over
    vector columns."""
    emb = _t(spark, sf_dir, "embeddings")
    sq_norm = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda a, v: a + v,
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(sq_norm), 6).alias("avg_sq_norm"),
    )


# ---------------------------------------------------------------------------
# Recommendation: SAR (SURVEY §2.10; reference recommendation/SAR.scala)
# ---------------------------------------------------------------------------

@register(
    "sar_affinity",
    oracle="""
    SELECT o_custkey AS user_id, l_partkey AS item_id,
           round(sum(l_quantity * pow(2,
                 -((epoch(TIMESTAMP '2001-09-01 00:00:00')
                    - epoch(o_orderdate)) / 60.0) / (30.0 * 24 * 60))), 6)
               AS affinity
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_partkey <= 500
    GROUP BY 1, 2
    """,
)
def sar_affinity(spark, sf_dir):
    """SAR time-decayed user-item affinity (SAR.scala:86-121) as pure
    column expressions — decay math stays inside whole-stage codegen,
    one shuffle on (user, item)."""
    from mmlspark_spark.recommendation.sar import user_item_affinity

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 500)
    inter = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
        F.col("o_orderdate"), F.col("l_quantity"),
    )
    aff = user_item_affinity(
        inter, "user_id", "item_id", timeCol="o_orderdate",
        ratingCol="l_quantity", timeDecayCoeff=30.0,
        startTime="2001-09-01 00:00:00",
    )
    return aff.select("user_id", "item_id", F.round("affinity", 6).alias("affinity"))


@register(
    "sar_item_similarity",
    oracle="""
    WITH ui AS (
      SELECT DISTINCT o_custkey AS u, l_partkey AS i
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_partkey <= 200
    ), occ AS (
      SELECT i, count(*) AS occ FROM ui GROUP BY i
    ), co AS (
      SELECT a.i AS item_i, b.i AS item_j, count(*) AS cooccur
      FROM ui a JOIN ui b ON a.u = b.u
      GROUP BY 1, 2
      HAVING count(*) >= 3
    )
    SELECT item_i, item_j, cooccur,
           round(cooccur / (oi.occ + oj.occ - cooccur), 6) AS similarity
    FROM co
    JOIN occ oi ON co.item_i = oi.i
    JOIN occ oj ON co.item_j = oj.i
    """,
    headline=True,
)
def sar_item_similarity(spark, sf_dir):
    """SAR Jaccard item-item similarity as a distributed self-join —
    replaces the reference's driver-collected sparse matrix
    (SAR.scala:155-174), which cannot exist at 100 TB. Edge list is
    distinct so the occ join is a broadcast of one row per item."""
    from mmlspark_spark.recommendation.sar import item_item_similarity

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 200)
    inter = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
    )
    sim = item_item_similarity(inter, "user_id", "item_id",
                               similarityFunction="jaccard", supportThreshold=3)
    return sim.select("item_i", "item_j", "cooccur",
                      F.round("similarity", 6).alias("similarity"))


@register(
    "sar_recommend",
    oracle="""
    WITH ui AS (
      SELECT DISTINCT o_custkey AS u, l_partkey AS i
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_partkey <= 200 AND o_custkey <= 100
    ), occ AS (
      SELECT i, count(*) AS occ FROM ui GROUP BY i
    ), co AS (
      SELECT a.i AS item_i, b.i AS item_j, count(*) AS cooccur
      FROM ui a JOIN ui b ON a.u = b.u
      GROUP BY 1, 2
      HAVING count(*) >= 2
    ), sim AS (
      SELECT item_i, item_j,
             cooccur / (oi.occ + oj.occ - cooccur) AS similarity
      FROM co JOIN occ oi ON co.item_i = oi.i
              JOIN occ oj ON co.item_j = oj.i
    ), aff AS (
      SELECT o_custkey AS u, l_partkey AS i, count(*)::DOUBLE AS affinity
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE l_partkey <= 200 AND o_custkey <= 100
      GROUP BY 1, 2
    ), scores AS (
      SELECT aff.u AS user_id, sim.item_j AS item_id,
             round(sum(aff.affinity * sim.similarity), 6) AS score
      FROM aff JOIN sim ON aff.i = sim.item_i
      GROUP BY 1, 2
    ), unseen AS (
      SELECT s.* FROM scores s
      WHERE NOT EXISTS (SELECT 1 FROM ui
                        WHERE ui.u = s.user_id AND ui.i = s.item_id)
    )
    SELECT user_id, item_id, score, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                 ORDER BY score DESC, item_id ASC) AS rank
      FROM unseen
    ) WHERE rank <= 5
    """,
)
def sar_recommend(spark, sf_dir):
    """End-to-end SAR: fit on interactions, top-5 unseen items per user —
    the BlockMatrix multiply of SARModel.scala:113-125 expressed as
    join + partial agg + window. Score rounded to 6dp BEFORE ranking so
    tie-break (item_id asc) is engine-invariant."""
    from mmlspark_spark.recommendation import SAR

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") <= 200)
    inter = o.join(li, o.o_orderkey == li.l_orderkey).filter(
        F.col("o_custkey") <= 100
    ).select(
        F.col("o_custkey").alias("user_id"),
        F.col("l_partkey").alias("item_id"),
    )
    # supportThreshold=2: at sf0.01 the bounded interaction subset has
    # no 3-support co-occurrences, and a 0-row match is vacuous
    model = SAR(userCol="user_id", itemCol="item_id",
                similarityFunction="jaccard", supportThreshold=2).fit(inter)
    recs = model.recommend_for_all_users(10**9, remove_seen=True)
    # re-rank on the rounded score for cross-engine determinism
    w = Window.partitionBy("user_id").orderBy(
        F.col("score").desc(), F.col("item_id").asc())
    return (
        recs.select("user_id", "item_id", F.round("score", 6).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# Cyber / anomaly (SURVEY §2.4 cyber scalers+indexers, §2.10 IsolationForest)
# ---------------------------------------------------------------------------

@register(
    "tenant_standard_scaler",
    oracle="""
    WITH stats AS (
      SELECT event_type, avg(value) AS m, stddev_pop(value) AS s
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round(CASE WHEN s != 0 THEN (value - m) / s
                      ELSE value - m END, 6) AS scaled
    FROM events e JOIN stats USING (event_type)
    WHERE event_id < 5000
    """,
)
def tenant_standard_scaler(spark, sf_dir):
    """Per-tenant z-score (cyber/feature/scalers.py StandardScalarScaler):
    stats via one groupBy per tenant, applied with a broadcast join +
    column expression — no UDF, unlike the reference."""
    from mmlspark_spark.anomaly import StandardScalarScaler

    ev = _t(spark, sf_dir, "events")
    model = StandardScalarScaler(inputCol="value", partitionKey="event_type",
                                 outputCol="scaled").fit(ev)
    return (model.transform(ev).filter(F.col("event_id") < 5000)
            .select("event_id", "event_type", F.round("scaled", 6).alias("scaled")))


@register(
    "tenant_linear_scaler",
    oracle="""
    WITH stats AS (
      SELECT event_type, min(value) AS lo, max(value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT event_id, e.event_type,
           round(CASE WHEN hi != lo THEN (100.0 / (hi - lo)) * value
                           + (100.0 - (100.0 / (hi - lo)) * hi)
                      ELSE 50.0 END, 6) + 0.0 AS scaled
    FROM events e JOIN stats USING (event_type)
    WHERE event_id < 5000
    """,
)
def tenant_linear_scaler(spark, sf_dir):
    """Per-tenant min-max map onto [0, 100] (LinearScalarScaler)."""
    from mmlspark_spark.anomaly import LinearScalarScaler

    ev = _t(spark, sf_dir, "events")
    model = LinearScalarScaler(inputCol="value", partitionKey="event_type",
                               outputCol="scaled", minRequiredValue=0.0,
                               maxRequiredValue=100.0).fit(ev)
    return (model.transform(ev).filter(F.col("event_id") < 5000)
            .select("event_id", "event_type",
                    # "+ 0.0" collapses IEEE -0.0 to 0.0 so the driver's
                    # value-hash agrees with the DuckDB oracle (which does
                    # the same normalization).
                    (F.round("scaled", 6) + F.lit(0.0)).alias("scaled")))


@register(
    "id_indexer",
    oracle="""
    WITH vocab AS (
      SELECT event_type, user_id,
             row_number() OVER (PARTITION BY event_type ORDER BY user_id) AS idx
      FROM (SELECT DISTINCT event_type, user_id FROM events)
    )
    SELECT event_id, e.event_type, v.idx
    FROM events e JOIN vocab v USING (event_type, user_id)
    WHERE event_id < 5000
    """,
)
def id_indexer(spark, sf_dir):
    """Per-tenant dense id indexing (cyber/feature/indexers.py IdIndexer):
    vocabulary = distinct pairs ranked by a window over the tenant key."""
    from mmlspark_spark.anomaly import IdIndexer

    ev = _t(spark, sf_dir, "events")
    model = IdIndexer(inputCol="user_id", partitionKey="event_type",
                      outputCol="idx", resetPerPartition=True).fit(ev)
    return (model.transform(ev).filter(F.col("event_id") < 5000)
            .select("event_id", "event_type", "idx"))


@register(
    "isolation_forest",
    oracle="""
    SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def isolation_forest(spark, sf_dir):
    """Seeded iForest over embeddings with PLANTED outliers (every 50th
    vector scaled 100x): raw path-length scores have no cross-engine
    oracle, but detection does — the top-|planted| scored ids must be
    exactly the planted set, which the oracle derives from the planting
    rule. An iForest that fails to isolate 100x-magnitude points fails
    the hash. Raw scores are asserted against an independent seeded
    reference in tests/test_anomaly.py."""
    from mmlspark_spark.anomaly import IsolationForest

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "features",
        F.when(F.col("vec_id") % 50 == 0,
               F.transform(F.col("embedding"),
                           lambda x: x.cast("double") * 100.0))
        .otherwise(F.col("embedding").cast("array<double>")))
    n_planted = emb.filter(F.col("vec_id") % 50 == 0).count()
    model = IsolationForest(featuresCol="features", numTrees=50,
                            maxSamples=128, seed=42).fit(emb)
    return (model.transform(emb)
            .orderBy(F.col("outlierScore").desc(), "vec_id")
            .limit(n_planted)
            .select("vec_id"))


@register("access_anomaly", oracle=None)
def access_anomaly(spark, sf_dir):
    """ALS-based anomalous-access scores over (user, event_type) pairs
    (cyber/anomaly/collaborative_filtering.py). Rows-only: ALS factors
    are seeded but not SQL-reproducible."""
    from mmlspark_spark.anomaly import AccessAnomaly

    ev = _t(spark, sf_dir, "events").withColumn("tenant", F.lit("t0"))
    pairs = ev.select("tenant", F.col("user_id").alias("user"),
                      F.col("event_type").alias("res"))
    model = AccessAnomaly(tenantCol="tenant", userCol="user", resCol="res",
                          rank=8, maxIter=5, seed=42).fit(pairs)
    probe = pairs.distinct().filter(F.col("user") < 50)
    return model.transform(probe).select(
        "user", "res", F.round("anomaly_score", 4).alias("anomaly_score"))


@register(
    "knn_stage",
    oracle="""
    SELECT vec_id, rank, neighbor FROM (
      SELECT q.vec_id AS vec_id,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_inner_product(q.embedding::DOUBLE[],
                                           d.embedding::DOUBLE[]) DESC,
                        d.vec_id ASC) - 1 AS INT) AS rank,
             CAST(d.vec_id AS VARCHAR) AS neighbor
      FROM embeddings q JOIN embeddings d ON d.vec_id < 2000
      WHERE q.vec_id < 50
    ) WHERE rank < 5
    """,
)
def knn_stage(spark, sf_dir):
    """KNN stage API (nn/KNN.scala parity): broadcast index + BLAS batch
    queries in mapInPandas. Exact mode is deterministic, so the whole
    stage path is SQL-oracled: max-inner-product top-5 with ties broken
    by index order (= vec_id order: the fit-side collect preserves the
    single-file parquet scan's row order, asserted in tests/test_nn.py
    exact-vs-brute)."""
    from mmlspark_spark.nn import KNN

    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "features", F.col("embedding").cast("array<double>")
    ).withColumn("values", F.col("vec_id").cast("string"))
    model = KNN(featuresCol="features", valuesCol="values",
                outputCol="nn", k=5).fit(emb.filter(F.col("vec_id") < 2000))
    out = model.transform(emb.filter(F.col("vec_id") < 50))
    # One scalar row per (vec_id, rank, neighbor): the driver harness
    # canonicalizer sorts/hashes columns and cannot handle array cells.
    return out.select(
        "vec_id",
        F.posexplode(F.expr("transform(nn, x -> x.value)")).alias(
            "rank", "neighbor"),
    )


# ---------------------------------------------------------------------------
# Explainers (SURVEY §2.10; reference explainers/LIMEBase, KernelSHAPBase)
# ---------------------------------------------------------------------------

@register("tabular_lime", oracle=None)
def tabular_lime(spark, sf_dir):
    """TabularLIME over a revenue model on lineitem: explode-sample →
    score → per-id weighted lasso in applyInPandas (rows-only; analytic
    recovery asserted in tests/test_explainers.py)."""
    from mmlspark_spark.explainers import TabularLIME
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    probe = li.limit(10)
    lime = TabularLIME(model=model, inputCols=["l_extendedprice", "l_discount"],
                       backgroundData=li.limit(500), targetCol="prediction",
                       numSamples=100, seed=42)
    out = lime.transform(probe)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("explanation")[0], 2).alias("w_price"),
        F.round(F.col("explanation")[1], 2).alias("w_discount"),
    )


@register("tabular_shap", oracle=None)
def tabular_shap(spark, sf_dir):
    """KernelSHAP over the same revenue model (rows-only; efficiency
    property asserted in tests)."""
    from mmlspark_spark.explainers import TabularSHAP
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        F.col("l_extendedprice") * (1 - F.col("l_discount"))))
    probe = li.limit(10)
    shap = TabularSHAP(model=model, inputCols=["l_extendedprice", "l_discount"],
                       backgroundData=li.limit(500), targetCol="prediction",
                       numSamples=64, seed=42)
    out = shap.transform(probe)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(F.col("shapValues")[0], 2).alias("base"),
        F.round(F.col("shapValues")[1], 2).alias("phi_price"),
        F.round(F.col("shapValues")[2], 2).alias("phi_discount"),
    )


@register(
    "embedding_dedup",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      WHERE vec_id < 300
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.v, b.v) >= 0.3
    """,
)
def embedding_dedup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, exact path over a bounded slice
    (the LSH path is the scale variant, recall-tested in tests).

    Threshold 0.3, not a production-like 0.9: the synthetic embeddings
    are near-orthogonal (max pairwise cosine ~0.47 at every SF), so any
    higher threshold makes the oracle comparison vacuous (0 rows on
    both sides proves nothing). 0.3 compares ~300 real pairs."""
    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    out = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                                threshold=0.3, method="exact").transform(emb)
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def _embedding_match_oracle(numPlanes: int = 16, bands: int = 8,
                            dim: int = 64, seed: int = 42,
                            split: int = 400, threshold: float = 0.2,
                            cap: int = 1000,
                            dead: str | None = None) -> str:
    """Replays EmbeddingDeduplicator.match_against_index: the SAME
    seeded numpy hyperplanes as _knn_lsh_oracle (regenerated at
    import, inlined as literals), sign-bit band chunks for ALL
    vectors, buckets counted over INDEX vectors only (stored-member
    cap — match-time semantics), batch×stored candidates on the
    chunk equi-join, exact cosine via the proven fold replay.
    ``dead`` (a vec_id predicate) replays a pending TOMBSTONE set:
    masked ids leave both the stored bucket-member counts (BEFORE
    the cap) and the candidate side — matching equals a fresh index
    over the survivors (the read-time-delete contract)."""
    import numpy as np

    from mmlspark_spark.plans.duckdb_xxh import cosine_sql, fold_sum

    planes = np.random.default_rng(seed).standard_normal((numPlanes,
                                                          dim))
    pls = "[" + ", ".join(
        "[" + ", ".join(repr(float(v)) for v in row) + "]"
        for row in planes) + "]::DOUBLE[][]"
    r = numPlanes // bands
    assert r == 2, "chunk expr below unrolls exactly r=2 bits"

    def bit(plane_ix: str) -> str:
        return (f"(CASE WHEN "
                f"{fold_sum(f'v[i2] * pls[{plane_ix}][i2]', dim)} > 0 "
                f"THEN 1 ELSE 0 END)")

    return f"""
    WITH pl AS (SELECT {pls} AS pls),
    e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), sig AS (
      SELECT vec_id, v,
             list_transform(range(0, {bands}),
               b -> {bit('2*b+1')} + 2 * {bit('2*b+2')}) AS chunks
      FROM e, pl
    ), band AS (
      SELECT vec_id, unnest(chunks) AS chunk,
             unnest(range(0, {bands})) AS band
      FROM sig
    ), bucketi AS (
      SELECT band, chunk, CAST(count(*) AS BIGINT) AS n
      FROM band WHERE {f"vec_id < {split}"
                       + (f" AND NOT ({dead})" if dead else "")}
      GROUP BY band, chunk
    ), cand AS (
      SELECT DISTINCT nb.vec_id AS id_a, d.vec_id AS id_b
      FROM band nb
      JOIN band d ON nb.band = d.band AND nb.chunk = d.chunk
      JOIN bucketi bi ON bi.band = nb.band AND bi.chunk = nb.chunk
      WHERE nb.vec_id >= {split} AND d.vec_id < {split}
        AND bi.n <= {cap}{
          f" AND NOT ({dead.replace('vec_id', 'd.vec_id')})"
          if dead else ""}
    )
    SELECT id_a, id_b,
           round({cosine_sql("ea.v", "eb.v", dim)}, 6) AS cosine
    FROM cand
    JOIN e ea ON ea.vec_id = id_a
    JOIN e eb ON eb.vec_id = id_b
    WHERE {cosine_sql("ea.v", "eb.v", dim)} >= {threshold}
    """


@register("embedding_match_indexed", oracle=_embedding_match_oracle())
def embedding_match_indexed(spark, sf_dir):
    """Incremental EMBEDDING near-dup against a PERSISTED LSH index —
    the semantic-dedup daily-ingest shape: the stored corpus
    (vec_id < 400) was banded ONCE under the seeded hyperplanes into
    (id, band, chunk) bucket keys + a vector store; the incoming
    batch (vec_id >= 400) bands only itself, equi-joins the stored
    keys (hot stored buckets capped before the fan-out), and exact
    cosine verifies the surviving candidates against the stored
    vectors. Threshold 0.2 because the synthetic embeddings are
    near-orthogonal (the embedding_dedup rationale). Oracle replays
    planes, chunks, stored-member cap, and the cosine fold
    bit-exact."""
    import os

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings")
    dd = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                               threshold=0.2, method="lsh",
                               numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"embdedup_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(emb.filter(F.col("vec_id") < 400), path)
    out = dd.match_against_index(
        dd.load_index(spark, path),
        emb.filter(F.col("vec_id") >= 400))
    return out.select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine"))


@register("embedding_match_tombstoned",
          oracle=_embedding_match_oracle(dead="vec_id % 5 = 0"))
def embedding_match_tombstoned(spark, sf_dir):
    """The DELETE half of the embedding near-dup stored-index
    lifecycle under the driver's hash gate (round 13): the stored
    vectors (vec_id < 400) tombstone every 5th id (metadata-only
    takedown), then the incoming batch screens against the index.
    Tombstoned ids leave the stored bucket store BEFORE the
    hot-bucket cap count and never surface as id_b — matching equals
    a fresh index over the survivors, exactly what the oracle
    replays (dead ids excluded from bucket counts and candidates in
    the seeded-hyperplane fragment). save_index clears stale
    tombstones on overwrite, so repeated driver runs are hermetic."""
    import os

    from mmlspark_spark.llm.dedup import EmbeddingDeduplicator

    emb = _t(spark, sf_dir, "embeddings")
    dd = EmbeddingDeduplicator(idCol="vec_id", vecCol="embedding",
                               threshold=0.2, method="lsh",
                               numPlanes=16, bands=8)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"embdedup_del_{os.path.basename(sf_dir.rstrip('/'))}")
    stored = emb.filter(F.col("vec_id") < 400)
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("vec_id") % 5 == 0).select("vec_id"),
        path)
    out = dd.match_against_index(
        dd.load_index(spark, path),
        emb.filter(F.col("vec_id") >= 400))
    return out.select("id_a", "id_b",
                      F.round("cosine", 6).alias("cosine"))


@register(
    "text_metrics",
    oracle="""
    SELECT doc_id,
           round(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                 AS DOUBLE) / greatest(length(text), 1), 6) AS punct_ratio,
           length(regexp_replace(text, '[A-Za-z]+|[0-9]+|[^ \\tA-Za-z0-9]',
                                 'X', 'g'))
             - length(regexp_replace(text,
                      '[A-Za-z]+|[0-9]+|[^ \\tA-Za-z0-9]', '', 'g'))
             AS subword_tokens
    FROM documents WHERE doc_id < 2000
    """,
)
def text_metrics(spark, sf_dir):
    """Punctuation ratio + BPE-ish subword count as pure expressions
    (SURVEY 'LLM extras' text analysis)."""
    from mmlspark_spark.functions.text_quality import (
        punct_ratio,
        subword_token_count,
    )

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select(
        "doc_id",
        F.round(punct_ratio("text"), 6).alias("punct_ratio"),
        subword_token_count("text").cast("bigint").alias("subword_tokens"),
    )


@register(
    "lang_id_heuristic",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
               x -> lower(x)) AS t
      FROM documents WHERE doc_id < 2000
    ),
    scored AS (
      SELECT doc_id,
        len(list_filter(t, x -> list_contains(
          ['der','die','das','und','ist','nicht','ein','mit'], x))) AS de,
        len(list_filter(t, x -> list_contains(
          ['the','and','of','is','that','with','for','this'], x))) AS en,
        len(list_filter(t, x -> list_contains(
          ['el','los','las','es','una','para','con','por'], x))) AS es,
        len(list_filter(t, x -> list_contains(
          ['le','la','les','et','est','une','dans','pour'], x))) AS fr,
        len(list_filter(t, x -> list_contains(
          ['il','gli','che','per','una','sono','con','di'], x))) AS it
      FROM toks
    )
    SELECT doc_id,
      CASE WHEN greatest(de, en, es, fr, it) = 0 THEN 'und'
           WHEN de = greatest(de, en, es, fr, it) THEN 'de'
           WHEN en = greatest(de, en, es, fr, it) THEN 'en'
           WHEN es = greatest(de, en, es, fr, it) THEN 'es'
           WHEN fr = greatest(de, en, es, fr, it) THEN 'fr'
           ELSE 'it' END AS pred_lang
    FROM scored
    """,
)
def lang_id_heuristic(spark, sf_dir):
    """Function-word-profile language ID over documents. The oracle
    replicates the exact scoring — per-language function-word hit
    counts, argmax with lexicographic-min tie-break, 'und' on zero hits
    — as DuckDB list expressions, so the heuristic itself is
    hash-checked (not just row counts)."""
    from mmlspark_spark.functions.text_quality import lang_id

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select("doc_id", lang_id("text").alias("pred_lang"))


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(
                 list_filter(string_split_regex(text, '\\s+'), x -> x <> ''),
                 t -> list_reduce(
                        list_prepend(0::BIGINT,
                          list_transform(string_split(t, ''),
                                         c -> ascii(c)::BIGINT)),
                        (a, c) -> (a * 131 + c) % 562949953421231))),
             (acc, th) -> (acc * 31 + th) % 562949953421231) AS fingerprint
    FROM documents
    WHERE doc_id < 2000
    """)
def doc_fingerprint_query(spark, sf_dir):
    """Order-sensitive rolling-hash content fingerprint, portable
    variant: Rabin-Karp char-polynomial token hash folded by position,
    pure modular arithmetic — so DuckDB reproduces it bit-for-bit (the
    oracle above mirrors the fold with list_reduce). The xxhash64
    variant (`doc_fingerprint`, the production default — cheaper per
    char) stays property-tested for determinism + order sensitivity in
    tests/test_properties.py; both are the same map-side operator with
    a pluggable token hash."""
    from mmlspark_spark.functions.text_quality import (
        doc_fingerprint_portable)

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    return docs.select(
        "doc_id", doc_fingerprint_portable("text").alias("fingerprint"))


@register(
    "winnow_fingerprint",
    oracle="""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                                 x -> x <> '') AS toks
      FROM documents WHERE doc_id < 300
    ), th AS (
      SELECT doc_id, list_transform(toks,
        t -> list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)),
             (a, c) -> (a * 131 + c) % 562949953421231)) AS tokh
      FROM t
    ), g AS (
      SELECT doc_id,
        CASE WHEN len(tokh) >= 4 THEN
          list_transform(range(0, len(tokh) - 3),
            i -> list_reduce(list_prepend(0::BIGINT,
                               list_slice(tokh, i + 1, i + 4)),
                 (a, h) -> (a * 31 + h) % 562949953421231))
        ELSE [] END AS grams
      FROM th
    ), w AS (
      SELECT doc_id, grams, least(4, len(grams)) AS W
      FROM g WHERE len(grams) > 0
    ), sel AS (
      SELECT doc_id,
        unnest(list_transform(range(0, len(grams) - W + 1),
          s -> {'pos': s + W - list_position(
                         list_reverse(list_slice(grams, s + 1, s + W)),
                         list_min(list_slice(grams, s + 1, s + W))),
                'fp': list_min(list_slice(grams, s + 1, s + W))})) AS e
      FROM w
    )
    SELECT DISTINCT doc_id, CAST(e.pos AS BIGINT) AS pos,
           CAST(e.fp AS BIGINT) AS fp
    FROM sel
    """)
def winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprints (Schleimer et al. 2003 / MOSS): 4-gram
    Rabin-Karp rolling hashes, window-4 rightmost-min selection — the
    position-aware local fingerprint family for copy/quote detection
    (any shared 7-token run is guaranteed a common fingerprint).
    Pure modular arithmetic throughout, so the oracle replays token
    hashing, gram folding AND the window argmin selection hash-exact.
    Map-side except the final fixed-width DISTINCT."""
    from mmlspark_spark.llm import winnow_fingerprints

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return winnow_fingerprints(docs, idCol="doc_id", textCol="text",
                               k=4, window=4)


@register(
    "cdc_chunks",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'),
                                 x -> x <> '') AS toks
      FROM documents WHERE doc_id < 300
    ), th AS (
      SELECT doc_id, toks, list_transform(toks,
        t -> list_reduce(list_prepend(0::BIGINT,
               list_transform(string_split(t, ''), c -> ascii(c)::BIGINT)),
             (a, c) -> (a * 131 + c) % 562949953421231)) AS tokh
      FROM t
    ), g AS (
      SELECT doc_id, toks,
        CASE WHEN len(tokh) >= 4 THEN
          list_transform(range(0, len(tokh) - 3),
            i -> list_reduce(list_prepend(0::BIGINT,
                               list_slice(tokh, i + 1, i + 4)),
                 (a, h) -> (a * 31 + h) % 562949953421231))
        ELSE [] END AS grams
      FROM th
    ), c AS (
      SELECT doc_id, toks,
        list_sort(list_distinct(
          [0] || list_transform(
                   list_filter(range(0, len(grams)),
                               i -> grams[i + 1] % 16 = 0),
                   i -> i + 4)
              || [len(toks)])) AS cuts
      FROM g WHERE len(toks) > 0
    ), sel AS (
      SELECT doc_id, toks, cuts, unnest(range(0, len(cuts) - 1)) AS j
      FROM c
    )
    SELECT doc_id, CAST(j AS BIGINT) AS chunk_id,
           CAST(cuts[j + 1] AS BIGINT) AS start,
           CAST(cuts[j + 2] - cuts[j + 1] AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, cuts[j + 1] + 1,
                                      cuts[j + 2]), ' ') AS chunk
    FROM sel WHERE cuts[j + 2] - cuts[j + 1] > 0
    """)
def cdc_chunks_q(spark, sf_dir):
    """Content-defined chunking (cdc_chunks, k=4, maskBits=4): chunk
    boundaries fall where the local 4-gram rolling hash ≡ 0 (mod 16),
    so an edit moves only the chunks around it — fixed-stride windows
    downstream of an insertion all shift (chunk_overlap shows that
    layout; this is the dedup-stable one, the LBFS/FastCDC idea at
    token granularity). The oracle replays token hashing, gram
    folding, boundary selection and chunk extraction hash-exact."""
    from mmlspark_spark.llm import cdc_chunks

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    out = cdc_chunks(docs, idCol="doc_id", textCol="text",
                     k=4, maskBits=4)
    return out.select("doc_id",
                      F.col("chunk_id").cast("long").alias("chunk_id"),
                      "start", "n_tokens", "chunk")


@register(
    "url_canonicalize",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             'HTTPS://Site' || (doc_id % 10)
               || '.Example.ORG:443/Path' || (doc_id % 3)
               || '/?b=2&utm_source=x&a=1&fbclid=zz#frag' || doc_id
               || '?x=' || (doc_id % 7) AS u
      FROM documents WHERE doc_id < 1000
    ), parts AS (
      SELECT doc_id,
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
          AS scheme,
        regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest,
        regexp_extract(u, '^[^#?]*\?([^#]*)', 1) AS query
      FROM raw
    ), comps AS (
      SELECT doc_id, scheme,
        lower(regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                             '^([^:]*)', 1)) AS host,
        regexp_extract(regexp_extract(rest, '^([^/?#]*)', 1),
                       ':([0-9]+)$', 1) AS port,
        regexp_extract(rest, '^[^/?#]*([^?#]*)', 1) AS path,
        array_to_string(list_sort(list_filter(string_split(query, '&'),
          p -> p <> '' AND NOT regexp_matches(
                 p, '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qs
      FROM parts
    )
    SELECT doc_id,
      scheme || '://' || host
      || CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443') THEN ''
              ELSE ':' || port END
      || coalesce(nullif(regexp_replace(path, '/+$', ''), ''), '/')
      || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical
    FROM comps
    """)
def url_canonicalize(spark, sf_dir):
    """URL canonicalization (canonicalize_url) — the key-maker for
    URL-level dedup and domain aggregation: lowercase scheme/host,
    default-port strip, fragment drop, tracking-param removal
    (utm_*/fbclid/gclid), sorted query params, trailing-slash
    collapse. Planted messy URLs (mixed case, :443, utm noise,
    per-doc fragment) exercise every rule; the oracle replays the
    whole normalization with the same conservative regex classes.
    Map-only — canonical keys turn URL dedup into an exact groupBy."""
    from mmlspark_spark.llm import canonicalize_url

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://Site"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".Example.ORG:443/Path"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit("/?b=2&utm_source=x&a=1&fbclid=zz#frag"),
            F.col("doc_id").cast("string"),
            # '?' INSIDE the fragment — must NOT resurrect as query
            F.lit("?x="), (F.col("doc_id") % 7).cast("string"),
        ).alias("u"))
    return planted.select(
        "doc_id", canonicalize_url("u").alias("canonical"))


def _ivf_cte(cent_ctes: str, nProbe: int, dim: int, nq: int = 5,
             corpus_where: str = "") -> str:
    """Shared IVF-replay WITH-fragment (the _bm25_cte pattern — ONE
    copy of the assignment/probe/candidate SQL so a tie-break or fold
    fix can never diverge between the IVF-family oracles).
    Expects an upstream CTE ``e(vec_id, v)``; ``cent_ctes`` must end
    in a CTE ``c(cell, cv)``; the fragment ends in ``cand(q_id, d_id,
    qv, dv)``: corpus top-1 cell / query top-nProbe cells by exact
    cosine with cell-ASC tie-break, candidates equi-joined on the
    cell. ``corpus_where`` (a predicate over ``d_id``) restricts the
    INDEXED corpus only — queries stay unrestricted — mirroring the
    filtered-index lanes (``knn_ivf_filtered``); cell assignment is
    per-vector, so filtering assignments equals assigning the
    filtered corpus."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    cos = cosine_sql("e.v", "c.cv", dim)
    cw = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""{cent_ctes}, dsim AS (
      SELECT e.vec_id AS d_id, e.v AS dv, c.cell, {cos} AS sim
      FROM e, c
    ), dass AS (
      SELECT d_id, dv, cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY sim DESC, cell ASC) AS rk
        FROM dsim{cw}) WHERE rk = 1
    ), qass AS (
      SELECT q_id, qv, cell FROM (
        SELECT d_id AS q_id, dv AS qv, cell, row_number() OVER (
          PARTITION BY d_id ORDER BY sim DESC, cell ASC) AS rk
        FROM dsim WHERE d_id < {nq}) WHERE rk <= {nProbe}
    ), cand AS (
      SELECT DISTINCT q_id, d_id, qv, dv
      FROM dass JOIN qass USING (cell) WHERE q_id <> d_id
    )"""


def _ivf_topk_tail(dim: int, k: int) -> str:
    """The exact-cosine top-k over ``cand`` ending the IVF replays."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    return f""", scored AS (
      SELECT q_id AS query_id, d_id AS neighbor_id,
             {cosine_sql("qv", "dv", dim)} AS sim
      FROM cand
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY sim DESC, neighbor_id) AS rk
          FROM scored)
    WHERE rk <= {k}
    """


def _knn_ivf_pretrained_oracle(nlist: int = 16, nProbe: int = 4,
                               k: int = 10, dim: int = 64,
                               corpus_where: str = "") -> str:
    """Replays the bring-your-own-quantizer IVF lane end-to-end: the
    centroid frame IS data (embeddings vec_id < nlist), assignment
    ranks cells by exact cosine with cell-ASC tie-break (corpus top-1,
    queries top-nProbe), candidates equi-join on the cell, and the
    final exact-cosine top-k window — every float computed with the
    same left-fold order as the Catalyst expressions (shared
    _ivf_cte/_ivf_topk_tail fragments over fold_sum/cosine_sql).
    ``corpus_where`` (a ``d_id`` predicate via the shared fragment)
    restricts the INDEXED corpus only — a survivor predicate replays
    both the tombstone mask and a post-compaction index, since cell
    assignment is per-vector (masking stored assignments == fresh
    index over survivors)."""
    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, corpus_where=corpus_where)}{
        _ivf_topk_tail(dim, k)}"""


@register("knn_ivf_pretrained", oracle=_knn_ivf_pretrained_oracle())
def knn_ivf_pretrained(spark, sf_dir):
    """IVF search with a PRE-TRAINED coarse quantizer passed as a
    small broadcast (cell, vector) frame — the faiss-style production
    shape where the quantizer is trained once offline — via
    IVFKNN.search_with_centroids: pure-Catalyst cosine cell
    assignment (combinable max-struct for the corpus, window for the
    queries), cell equi-join, exact-cosine top-k. Fully replayed by
    the oracle (unlike knn_ivf's sampled numpy fit, which stays the
    rows-only scale lane)."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    out = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4).search_with_centroids(emb, q, cent)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_ivf_appended", oracle=_knn_ivf_pretrained_oracle())
def knn_ivf_appended(spark, sf_dir):
    """The APPEND half of the CELL-PARTITIONED store geometry under
    the driver's hash gate (round 14 — completing the append matrix:
    bucket rows = minhash_match_appended, merged stats =
    bm25_search_appended, cell directories = this lane): even vectors
    index first (save_index), odd vectors append incrementally —
    appended vectors assign against the STORED centroids map-side and
    land as new files in their cell directories, the existing corpus
    never re-read — then the standard queries search the grown
    artifact. The oracle is the plain fresh-build replay over the
    full corpus (the quantizer is fixed at save time, the faiss
    operating model, so appended == fresh exactly)."""
    import os

    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_app_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb.filter(F.col("vec_id") % 2 == 0), cent, path)
    ivf.append_to_index(emb.filter(F.col("vec_id") % 2 == 1), path)
    out = ivf.search_with_index(ivf.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _ivf_stored_lane(spark, sf_dir, suffix: str, dead_mod: int,
                     compact: bool):
    """Shared body of the two stored-IVF delete lanes: save the
    cell-partitioned artifact, tombstone every ``dead_mod``-th
    vector, optionally COMPACT (physical rewrite of affected cell
    directories), then search the stored index. Tombstoned-vs-
    compacted must return identical rows — the tombstone lane proves
    the read-time mask, the compacted lane proves the physical
    rewrite, and both hash against the same survivor replay."""
    import os

    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_{suffix}_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb, cent, path)
    ivf.delete_from_index(
        emb.filter(F.col("vec_id") % dead_mod == 0).select("vec_id"),
        path)
    if compact:
        ivf.compact_index(spark, path)
    out = ivf.search_with_index(ivf.load_index(spark, path), q)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_ivf_tombstoned", oracle=_knn_ivf_pretrained_oracle(
    corpus_where="NOT (d_id % 7 = 0)"))
def knn_ivf_tombstoned(spark, sf_dir):
    """The DELETE half of the stored-IVF lifecycle under the
    driver's hash gate (round 13 — the last index family whose
    tombstones were pytest-only): the whole corpus indexes into the
    cell-partitioned artifact, every 7th vector is tombstoned
    (metadata-only takedown — cell directories untouched), and
    search_with_index masks the dead ids at read time. Cell
    assignment is per-vector, so masking stored assignments equals a
    fresh index over the survivors — exactly what the oracle replays
    (the shared _ivf_cte with the survivor predicate on the indexed
    corpus; queries stay unrestricted). save_index clears stale
    tombstones on overwrite, so repeated driver runs are hermetic."""
    return _ivf_stored_lane(spark, sf_dir, "del", 7, compact=False)


@register("knn_ivf_compacted", oracle=_knn_ivf_pretrained_oracle(
    corpus_where="NOT (d_id % 6 = 0)"))
def knn_ivf_compacted(spark, sf_dir):
    """COMPACTION under the driver's hash gate (round 13 — until now
    compacted==fresh was pinned only in pytest): save → tombstone
    every 6th vector → compact_index (physically rewrites ONLY the
    cell directories containing a dead id, drops fully-dead cells,
    clears the tombstone set) → search the rewritten artifact. The
    oracle replays a fresh index over the survivors — a hash match
    proves the PHYSICAL rewrite preserves search results exactly,
    not just the read-time mask (its sibling knn_ivf_tombstoned, at
    a different dead set so neither lane can shadow the other)."""
    return _ivf_stored_lane(spark, sf_dir, "cmp", 6, compact=True)


def _knn_ivf_filtered_oracle(nlist: int = 16, nProbe: int = 4,
                             k: int = 10, dim: int = 64) -> str:
    """The pretrained-IVF replay with the corpus predicate pushed
    below assignment (corpus_where on the shared _ivf_cte fragment) —
    filtered-index semantics: the inverted lists hold only matching
    vectors, so top-k never under-fills from post-filtering."""
    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, corpus_where="d_id >= 100")}{
        _ivf_topk_tail(dim, k)}"""


@register("knn_ivf_filtered", oracle=_knn_ivf_filtered_oracle())
def knn_ivf_filtered(spark, sf_dir):
    """FILTERED IVF — the metadata predicate (vec_id >= 100, a plain
    range) sits BELOW the cell assignment, so it pushes to the
    parquet scan and the inverted lists hold exactly the searchable
    subset — filtered-index semantics (the knn_sq8_filtered pattern;
    faiss IDSelector at build), never post-filtering, which silently
    returns < k rows. Cell assignment is per-vector, so filtering
    before assignment equals filtering a stored index's cell
    directories (the `where=` parameter on search_with_index —
    round-trip pinned in tests). Queries stay unrestricted."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    q = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 100)
    out = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4).search_with_centroids(
        corpus, q, cent)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _ann_recall_oracle(nlist: int = 16, nProbe: int = 4, k: int = 10,
                       dim: int = 64, nq: int = 5) -> str:
    """Composes the two proven replays — the bring-your-own-quantizer
    IVF search (_knn_ivf_pretrained_oracle's CTEs) and the exact
    brute-force top-k — and counts the member-set overlap per query.
    Only membership reaches the output (hits, recall), so this checks
    that BOTH search pipelines produce identical candidate SETS on
    both engines, the property every recall claim in tests rests
    on."""
    from mmlspark_spark.plans.duckdb_xxh import cosine_sql

    def cos(a: str, b: str) -> str:
        return cosine_sql(a, b, dim)

    cent = (f"""c AS (
      SELECT vec_id AS cell, v AS cv FROM e WHERE vec_id < {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim, nq)}, iv AS (
      SELECT q_id, d_id FROM (
        SELECT q_id, d_id, row_number() OVER (
          PARTITION BY q_id
          ORDER BY {cos("qv", "dv")} DESC, d_id) AS rk
        FROM cand) WHERE rk <= {k}
    ), bf AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, d.vec_id AS d_id, row_number() OVER (
          PARTITION BY q.vec_id
          ORDER BY {cos("q.v", "d.v")} DESC, d.vec_id) AS rk
        FROM (SELECT * FROM e WHERE vec_id < {nq}) q, e d
        WHERE q.vec_id <> d.vec_id) WHERE rk <= {k}
    ), h AS (
      SELECT bf.q_id, CAST(count(iv.d_id) AS BIGINT) AS hits
      FROM bf LEFT JOIN iv ON bf.q_id = iv.q_id AND bf.d_id = iv.d_id
      GROUP BY bf.q_id
    )
    SELECT q_id AS query_id, hits,
           round(hits / {float(k)}, 6) AS recall
    FROM h
    """


@register("ann_recall", oracle=_ann_recall_oracle())
def ann_recall(spark, sf_dir):
    """Distributed recall@10 of the IVF lane against the exact
    brute-force baseline — the evaluation loop every production ANN
    deployment runs (tune nProbe until recall clears the bar), here
    as a single Spark job: both searches are pure Catalyst, the
    overlap is a semi-join + count per query, and the oracle replays
    BOTH pipelines so the member sets (not just the counts) are
    cross-engine-proven. Uses the pretrained quantizer shape
    (vec_id < 16 as cells) so recall is a pure function of the
    data."""
    from mmlspark_spark.llm.similarity import IVFKNN, BruteForceKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    cent = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("cvec"))
    approx = (IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                     nlist=16, nProbe=4)
              .search_with_centroids(emb, q, cent)
              .select("query_id", "neighbor_id"))
    exact = (BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10)
             .search(emb, q).select("query_id", "neighbor_id"))
    hits = (exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
            .groupBy("query_id").agg(F.count("*").alias("hits")))
    return (exact.select("query_id").distinct()
            .join(hits, "query_id", "left")
            .select("query_id",
                    F.coalesce("hits", F.lit(0)).cast("bigint")
                    .alias("hits"),
                    F.round(F.coalesce("hits", F.lit(0)) / F.lit(10.0), 6)
                    .alias("recall")))


def _phrase_oracle(plen: int = 4, k: int = 10,
                   pids: str = "3, 47, 101") -> str:
    """Replays phrase_search end-to-end: positional postings (0-based
    offsets via the range/struct unnest), phrase slots from the same
    pinned tokenizer, all-slots-found gate (m = n), and the shifted
    intersection ``|∩_i (positions_i − i)|`` — integer set math, no
    float channel at all."""
    return f"""
    WITH t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL
    ), post AS (
      SELECT doc_id, u.term, u.pos FROM (
        SELECT doc_id, unnest(list_transform(range(len(tk)),
                 i -> struct_pack(pos := i, term := tk[i + 1]))) AS u
        FROM t)
    ), postl AS (
      SELECT term, doc_id, list(pos ORDER BY pos) AS ps
      FROM post GROUP BY term, doc_id
    ), ph AS (
      SELECT doc_id AS pid, tk[1:{plen}] AS ptk FROM t
      WHERE doc_id IN ({pids})
    ), pterms AS (
      SELECT pid, u.i, u.term FROM (
        SELECT pid, unnest(list_transform(range(len(ptk)),
                 i -> struct_pack(i := i, term := ptk[i + 1]))) AS u
        FROM ph)
    ), n AS (
      SELECT pid, count(*) AS n FROM pterms GROUP BY pid
    ), hits AS (
      SELECT p.pid, p.i, pl.doc_id, pl.ps
      FROM pterms p JOIN postl pl ON pl.term = p.term
    ), per AS (
      SELECT pid, doc_id, count(*) AS m,
             list(struct_pack(i := i, ps := ps) ORDER BY i) AS slots
      FROM hits GROUP BY pid, doc_id
    ), tf AS (
      SELECT pid, doc_id,
             CAST(len(list_reduce(
               list_transform(slots,
                 s -> list_transform(s.ps, p -> p - s.i)),
               (a2, b2) -> list_intersect(a2, b2))) AS BIGINT)
               AS phrase_tf
      FROM per JOIN n USING (pid) WHERE m = n
    )
    SELECT pid AS query_id, doc_id, phrase_tf,
           CAST(rk AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (
            PARTITION BY pid
            ORDER BY phrase_tf DESC, doc_id) AS rk
          FROM tf WHERE phrase_tf > 0)
    WHERE rk <= {k}
    """


@register("bm25_phrase_search", oracle=_phrase_oracle())
def bm25_phrase_search(spark, sf_dir):
    """Exact-phrase retrieval over positional postings
    (BM25Retriever.phrase_search) — the decontamination-audit
    primitive: which documents contain these 4 tokens VERBATIM and
    consecutively. Phrases are the first 4 tokens of docs 3/47/101
    (derived identically on both engines), so the source doc is a
    guaranteed hit at offset 0 and any true n-gram collision
    elsewhere in the corpus must appear on BOTH sides. The match
    count is the shifted-positions intersection — pure integer set
    math, broadcast phrase slots onto the term-keyed postings
    exchange, no corpus scan."""
    from mmlspark_spark.functions.text_quality import pinned_tokens
    from mmlspark_spark.llm import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    phrases = (docs.filter(F.col("doc_id").isin(3, 47, 101))
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(
                           F.slice(pinned_tokens("text"), 1, 4), " ")
                       .alias("query")))
    return BM25Retriever(k=10).phrase_search(docs, phrases)


@register("bm25_phrase_indexed", oracle=_phrase_oracle(
    plen=3, k=10, pids="5, 64, 202"))
def bm25_phrase_indexed(spark, sf_dir):
    """Exact-phrase retrieval FROM A PERSISTED INDEX — the production
    decontamination-audit loop: save_index(positions=True) writes the
    positional postings (term-clustered parquet, Lucene's PhraseQuery
    layout) once, then phrase_search_with_index answers every audit
    from the artifact without re-tokenizing the corpus. Results are
    identical to the from-docs lane by construction (positions are
    deterministic integers); this lane uses different phrases (first
    3 tokens of docs 5/64/202) so its driver hash is an independent
    check, not a copy of bm25_phrase_search's."""
    import os

    from mmlspark_spark.functions.text_quality import pinned_tokens
    from mmlspark_spark.llm import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    phrases = (docs.filter(F.col("doc_id").isin(5, 64, 202))
               .select(F.col("doc_id").alias("query_id"),
                       F.array_join(
                           F.slice(pinned_tokens("text"), 1, 3), " ")
                       .alias("query")))
    bm = BM25Retriever(k=10)
    path = os.path.join("/tmp/mmlspark_spark_idx",
                        f"bm25_phrase_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path, positions=True)
    return bm.phrase_search_with_index(bm.load_index(spark, path),
                                       phrases)


def _bm25_cte(k1: float = 1.2, b: float = 0.75,
              qids: str = "3, 47, 101", qlen: int = 6,
              dead: str | None = None,
              corpus_where: str | None = None) -> str:
    """Shared BM25 WITH-fragment ending in CTE ``bm(query_id, doc_id,
    score, rnk)`` — used by BOTH bm25_search and hybrid_rrf so the
    idf/tf formula replay cannot drift between them. Every double op
    mirrors retrieval.BM25Retriever operation-for-operation; the
    per-(query, doc) fold runs in term-sorted order (list ORDER BY
    term + left fold) exactly like the Spark array_sort fold.
    ``dead`` (a doc_id predicate) replays a pending TOMBSTONE set
    under the Lucene deleted-docs model: masked docs never score
    (filtered out of the hits), but df / N / avgdl still count them
    until compaction — exactly search_with_index's read-time mask.
    ``corpus_where`` instead restricts the CORPUS itself (the ``t``
    tokenize CTE), so df / N / avgdl recompute over the survivors —
    the post-COMPACTION replay (compact_index's fresh-over-survivors
    contract). The query docs (``qids``) must satisfy it: queries
    tokenize from ``t`` in this replay, while the production lane
    builds them from the raw table."""
    dead_where = (f"WHERE NOT ({dead.replace('doc_id', 'p.doc_id')})"
                  if dead else "")
    cw = f" AND ({corpus_where})" if corpus_where else ""
    return f"""t AS (
      SELECT doc_id, list_filter(
               string_split_regex(text, '[ \\t\\n\\r]+'),
               x -> x <> '') AS tk
      FROM documents WHERE text IS NOT NULL{cw}
    ), post AS (
      SELECT doc_id, dl, w AS term, CAST(count(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, len(tk) AS dl, unnest(tk) AS w FROM t)
      GROUP BY doc_id, dl, w
    ), dfq AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
      GROUP BY term
    ), st AS (
      SELECT CAST(count(*) AS BIGINT) AS nn,
             CAST(sum(len(tk)) AS DOUBLE) / count(*) AS avgdl
      FROM t
    ), qterms AS (
      SELECT DISTINCT doc_id AS qid, unnest(tk[1:{qlen}]) AS term
      FROM t WHERE doc_id IN ({qids})
    ), hits AS (
      SELECT q.qid, p.doc_id, p.term,
             ln(1.0 + (st.nn - d.df + 0.5) / (d.df + 0.5))
             * (p.tf * {k1 + 1.0})
             / (p.tf + {k1} * (1.0 - {b}
                               + {b} * (CAST(p.dl AS DOUBLE)
                                        / st.avgdl))) AS part
      FROM qterms q JOIN post p USING (term)
      JOIN dfq d ON d.term = p.term CROSS JOIN st
      {dead_where}
    ), bm AS (
      SELECT qid AS query_id, doc_id, score,
             row_number() OVER (
               PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
      FROM (SELECT qid, doc_id,
                   round(list_reduce(
                     list_prepend(0.0::DOUBLE,
                                  list(part ORDER BY term)),
                     (a2, b2) -> a2 + b2), 6) AS score
            FROM hits GROUP BY qid, doc_id)
    )"""


def _bm25_oracle(k: int = 10) -> str:
    return f"""
    WITH {_bm25_cte()}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= {k}
    """


@register("bm25_search", oracle=_bm25_oracle())
def bm25_search(spark, sf_dir):
    """Okapi BM25 retrieval (BM25Retriever): queries are the first 6
    tokens of docs 3/47/101, searched against the whole corpus. The
    inverted index is one explode + groupBy(term, doc); document
    frequency shares the postings' term key (one exchange); the tiny
    query-term frame broadcasts onto it; N/avgdl ride a one-row
    broadcast. Per-(query, doc) contributions fold in term-sorted
    order — never an unordered float SUM — so the Lucene-variant idf
    and tf saturation replay hash-exact; scores round to 6dp before
    the top-10 rank."""
    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    out = BM25Retriever(k=10).search(docs, _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_tombstoned", oracle=f"""
    WITH {_bm25_cte(dead="doc_id % 7 = 0")}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= 10
    """)
def bm25_search_tombstoned(spark, sf_dir):
    """BM25 search from a stored index with PENDING tombstones under
    the driver's hash gate (round 12): the whole corpus indexes once,
    every 7th doc is tombstoned (takedown — metadata-only), and
    search_with_index masks them at read time under the Lucene
    deleted-docs model: masked docs never surface, but df / N / avgdl
    still count them until compaction — which is exactly what the
    oracle replays (the shared _bm25_cte fold with dead docs filtered
    from the hits, stats over the full index). save_index clears
    stale tombstones on overwrite, so repeated driver runs are
    hermetic."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_del_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path)
    bm.delete_from_index(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_appended", oracle=_bm25_oracle())
def bm25_search_appended(spark, sf_dir):
    """The APPEND half of the BM25 lifecycle under the driver's hash
    gate (round 14): even docs index first (save_index), odd docs
    append incrementally — appended docs tokenize ALONE, document
    frequency re-aggregates over the MERGED postings (index-sized
    agg, never a corpus re-tokenize), and the one-row stats extend
    over the exact stored token sum — then the standard queries
    search the grown artifact. The oracle is the plain fresh-build
    replay over the full corpus, so a hash match proves incrementally
    built == batch-built bit-for-bit through the driver (previously
    pinned only in the streaming pytest)."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_app_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs.filter(F.col("doc_id") % 2 == 0), path)
    bm.append_to_index(docs.filter(F.col("doc_id") % 2 == 1), path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


@register("bm25_search_compacted", oracle=f"""
    WITH {_bm25_cte(corpus_where="NOT (doc_id % 7 = 0)")}
    SELECT query_id, doc_id, score, CAST(rnk AS INTEGER) AS rk
    FROM bm WHERE rnk <= 10
    """)
def bm25_search_compacted(spark, sf_dir):
    """COMPACTION of the flat-store geometry under the driver's hash
    gate (round 13 — its cell-partitioned sibling is
    knn_ivf_compacted): save → tombstone every 7th doc →
    compact_index (postings/doclens rewritten via staging+rename,
    df re-aggregated from the compacted postings, the one-row stats
    subtract the dead docs' exact (count, Σdl) off the stored
    integers) → search the rewritten artifact. The oracle replays a
    FRESH build over the survivors — df / N / avgdl over the
    surviving corpus, unlike bm25_search_tombstoned's Lucene
    deleted-docs stats — so a hash match proves compacted ==
    fresh-over-survivors bit-for-bit through the driver, not just
    pytest. Query docs 3/47/101 are not ≡0 (mod 7), so the replay's
    query tokenization is unaffected by the survivor cut."""
    import os

    from mmlspark_spark.llm.retrieval import BM25Retriever

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_cmp_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, path)
    bm.delete_from_index(
        docs.filter(F.col("doc_id") % 7 == 0).select("doc_id"), path)
    bm.compact_index(spark, path)
    out = bm.search_with_index(bm.load_index(spark, path),
                               _bm25_queries(docs))
    return out.select("query_id", "doc_id", "score",
                      F.col("rank").alias("rk"))


def _bm25_queries(docs):
    from mmlspark_spark.functions.text_quality import pinned_tokens

    return (docs.filter(F.col("doc_id").isin(3, 47, 101))
            .select(F.col("doc_id").alias("query_id"),
                    F.array_join(F.slice(pinned_tokens("text"), 1, 6),
                                 " ").alias("query")))


def _hybrid_rrf_oracle(k: int = 10, rrf_k: float = 60.0) -> str:
    return f"""
    WITH {_bm25_cte()}, dn AS (
      SELECT query_id, doc_id, rnk FROM (
        SELECT q.vec_id AS query_id, d.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_cosine_similarity(
                   q.embedding::DOUBLE[], d.embedding::DOUBLE[]) DESC,
                 d.vec_id) AS rnk
        FROM embeddings q JOIN embeddings d
          ON q.vec_id IN (3, 47, 101) AND d.vec_id <> q.vec_id)
      WHERE rnk <= {k}
    ), fused AS (
      SELECT COALESCE(b.query_id, d.query_id) AS query_id,
             COALESCE(b.doc_id, d.doc_id) AS doc_id,
             round(0.0 + COALESCE(1.0 / ({rrf_k} + b.rnk), 0.0)
                       + COALESCE(1.0 / ({rrf_k} + d.rnk), 0.0), 6)
               AS rrf_score
      FROM (SELECT query_id, doc_id, rnk FROM bm WHERE rnk <= {k}) b
      FULL OUTER JOIN dn d
        ON b.query_id = d.query_id AND b.doc_id = d.doc_id
    )
    SELECT query_id, doc_id, rrf_score, CAST(rnk2 AS INTEGER) AS rk
    FROM (SELECT query_id, doc_id, rrf_score,
                 row_number() OVER (
                   PARTITION BY query_id
                   ORDER BY rrf_score DESC, doc_id) AS rnk2
          FROM fused)
    WHERE rnk2 <= {k}
    """


@register("hybrid_rrf_indexed", oracle=_hybrid_rrf_oracle())
def hybrid_rrf_indexed(spark, sf_dir):
    """The COMPOSED serving path from persisted artifacts under the
    driver's hash gate (round 14): both retrieval legs answer from
    stored indexes — BM25 from the parquet postings artifact
    (save_index → search_with_index) and dense cosine from the
    cell-partitioned IVF artifact probed with nProbe == nlist (every
    cell read → EXACT top-k; the stored-layout cost model, the
    in-memory ranking semantics) — then reciprocal rank fusion joins
    the two already-top-k frames. The oracle is the SAME replay as
    the in-memory hybrid_rrf lane: a hash match proves the entire
    retrieval stack (index build, stored search, fusion) returns
    bit-identical rankings from artifacts as from memory."""
    import os

    from mmlspark_spark.llm.retrieval import (
        BM25Retriever,
        reciprocal_rank_fusion,
    )
    from mmlspark_spark.llm.similarity import IVFKNN

    docs = _t(spark, sf_dir, "documents")
    bm = BM25Retriever(k=10)
    bpath = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"bm25_hyb_{os.path.basename(sf_dir.rstrip('/'))}")
    bm.save_index(docs, bpath)
    bmr = (bm.search_with_index(bm.load_index(spark, bpath),
                                _bm25_queries(docs))
           .select("query_id", "doc_id", "rank"))

    emb = _t(spark, sf_dir, "embeddings")
    cent = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cell"),
        F.col("embedding").alias("cvec"))
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=4, nProbe=4)
    vpath = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivf_hyb_{os.path.basename(sf_dir.rstrip('/'))}")
    ivf.save_index(emb, cent, vpath)
    q = emb.filter(F.col("vec_id").isin(3, 47, 101))
    dn = (ivf.search_with_index(ivf.load_index(spark, vpath), q)
          .select("query_id", F.col("neighbor_id").alias("doc_id"),
                  "rank"))
    fused = reciprocal_rank_fusion([bmr, dn], k=60, topK=10)
    return fused.select("query_id", "doc_id", "rrf_score",
                        F.col("rank").alias("rk"))


@register("hybrid_rrf", oracle=_hybrid_rrf_oracle())
def hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval: BM25 (sparse, documents) and exact cosine
    (dense, embeddings) top-10 lists for queries 3/47/101, combined
    by reciprocal rank fusion — score = 1/(60+rank_bm25) +
    1/(60+rank_dense), sources added in list order, docs absent from
    a source contributing 0 (Cormack et al. 2009; rank-only fusion
    needs no cross-retriever score normalization). The fusion joins
    two already-top-k frames, so it is small however large the
    corpus; both source rankings and the fused scores replay
    hash-exact."""
    from mmlspark_spark.llm import BruteForceKNN
    from mmlspark_spark.llm.retrieval import (
        BM25Retriever,
        reciprocal_rank_fusion,
    )

    docs = _t(spark, sf_dir, "documents")
    bm = (BM25Retriever(k=10).search(docs, _bm25_queries(docs))
          .select("query_id", "doc_id", "rank"))
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(3, 47, 101))
    dn = (BruteForceKNN(idCol="vec_id", vecCol="embedding", k=10,
                        method="expr").search(emb, q)
          .select("query_id", F.col("neighbor_id").alias("doc_id"),
                  "rank"))
    fused = reciprocal_rank_fusion([bm, dn], k=60, topK=10)
    return fused.select("query_id", "doc_id", "rrf_score",
                        F.col("rank").alias("rk"))


def _knn_pq_oracle(M: int = 8, K: int = 16, ds: int = 8, k: int = 10,
                   nq: int = 5) -> str:
    """Replays the full PQ/ADC pipeline (PQKNN.search_with_codebooks):
    codebook synthesis (subvector m of embedding m·K+c), per-subspace
    squared-L2 encoding with the direct (x−c)² left fold and
    first-min argmin, the per-query LUT, the m-ascending ADC fold,
    and the distance-ASC top-k window — every double in the same
    operation order as the Catalyst expressions."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    dd = fold_sum("(sub[i2] - cvec[i2]) * (sub[i2] - cvec[i2])", ds)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), cb AS (
      SELECT vec_id // {K} AS m, vec_id % {K} AS code,
             v[(vec_id // {K}) * {ds} + 1 : (vec_id // {K}) * {ds} + {ds}]
               AS cvec
      FROM e WHERE vec_id < {M * K}
    ), dists AS (
      SELECT vec_id, m, code, {dd} AS dd
      FROM (SELECT e.vec_id, cb.m, cb.code,
                   e.v[cb.m * {ds} + 1 : cb.m * {ds} + {ds}] AS sub,
                   cb.cvec
            FROM e, cb)
    ), codes AS (
      SELECT vec_id, m,
             list_position(l, list_aggregate(l, 'min')) - 1 AS code
      FROM (SELECT vec_id, m, list(dd ORDER BY code) AS l
            FROM dists GROUP BY vec_id, m)
    ), adc AS (
      SELECT q_id, d_id,
             list_reduce(list_prepend(0.0::DOUBLE,
                                      list(val ORDER BY m)),
                         (a2, b2) -> a2 + b2) AS adc
      FROM (SELECT qd.vec_id AS q_id, dc.vec_id AS d_id, dc.m AS m,
                   qd.dd AS val
            FROM codes dc JOIN dists qd
              ON qd.m = dc.m AND qd.code = dc.code
            WHERE qd.vec_id < {nq} AND qd.vec_id <> dc.vec_id)
      GROUP BY q_id, d_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY adc ASC, d_id ASC) AS rk
          FROM adc)
    WHERE rk <= {k}
    """


@register("knn_pq_adc", oracle=_knn_pq_oracle())
def knn_pq_adc(spark, sf_dir):
    """Product-quantization ANN (PQKNN.search_with_codebooks): 64-dim
    embeddings compressed to 8 subspace codes against a pre-trained
    (m, code, cvec) codebook frame (subvector m of embeddings
    m·16+c), then ADC top-10 for 5 queries — per-query 8×16 exact
    LUT, candidates scored with 8 lookups instead of 64 multiplies.
    Codebooks broadcast as one aggregated row; encoding is map-only;
    the scan is a broadcast cross join collapsed by the top-k window.
    Fully replayed by the oracle (squared-L2 folds, first-min argmin,
    m-ascending ADC fold all order-pinned); the sampled-fit lane
    (fit_codebooks) stays rows-only like knn_ivf's."""
    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cb = (emb.filter(F.col("vec_id") < 128)
          .select(F.expr("vec_id div 16").cast("int").alias("m"),
                  (F.col("vec_id") % 16).cast("int").alias("code"),
                  F.slice("embedding",
                          F.expr("(vec_id div 16) * 8 + 1").cast("int"),
                          8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 5)
    out = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
                dim=64).search_with_codebooks(emb, q, cb)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


def _knn_ivfpq_oracle(M: int = 8, K: int = 16, ds: int = 8,
                      dim: int = 64, nlist: int = 8, nProbe: int = 3,
                      k: int = 10, nq: int = 5) -> str:
    """Replays PQKNN.search_ivfpq (IVFADC) end-to-end: squared-L2
    coarse assignment with cell-ASC tie-break (corpus argmin, query
    top-nProbe), residual computation, residual PQ encoding against
    the shared codebooks, the per-(query, cell) residual LUT, the
    m-ascending ADC fold, and the distance-ASC top-k — all folds in
    the exact Catalyst element order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    l2 = fold_sum("(e.v[i2] - c.cv[i2]) * (e.v[i2] - c.cv[i2])", dim)
    sub2 = fold_sum("(sub[i2] - cvec[i2]) * (sub[i2] - cvec[i2])", ds)
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), c AS (
      SELECT vec_id - 200 AS cell, v AS cv FROM e
      WHERE vec_id BETWEEN 200 AND {200 + nlist - 1}
    ), cb AS (
      SELECT vec_id // {K} AS m, vec_id % {K} AS code,
             v[(vec_id // {K}) * {ds} + 1 : (vec_id // {K}) * {ds} + {ds}]
               AS cvec
      FROM e WHERE vec_id < {M * K}
    ), dd AS (
      SELECT e.vec_id AS d_id, c.cell, {l2} AS d2,
             list_transform(range(1, {dim + 1}),
                            i9 -> e.v[i9] - c.cv[i9]) AS res
      FROM e, c
    ), dass AS (
      SELECT d_id, cell, res FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM dd) WHERE rk = 1
    ), ddist AS (
      SELECT d_id, cell, m, code, {sub2} AS dv
      FROM (SELECT a.d_id, a.cell, b.m, b.code,
                   a.res[b.m * {ds} + 1 : b.m * {ds} + {ds}] AS sub,
                   b.cvec
            FROM dass a, cb b)
    ), dcode AS (
      SELECT d_id, cell, m,
             list_position(l, list_aggregate(l, 'min')) - 1 AS code
      FROM (SELECT d_id, cell, m, list(dv ORDER BY code) AS l
            FROM ddist GROUP BY d_id, cell, m)
    ), qass AS (
      SELECT d_id AS q_id, cell, res FROM (
        SELECT *, row_number() OVER (
          PARTITION BY d_id ORDER BY d2 ASC, cell ASC) AS rk
        FROM dd WHERE d_id < {nq}) WHERE rk <= {nProbe}
    ), qdist AS (
      SELECT q_id, cell, m, code, {sub2} AS dv
      FROM (SELECT a.q_id, a.cell, b.m, b.code,
                   a.res[b.m * {ds} + 1 : b.m * {ds} + {ds}] AS sub,
                   b.cvec
            FROM qass a, cb b)
    ), adc AS (
      SELECT q_id, d_id,
             list_reduce(list_prepend(0.0::DOUBLE,
                                      list(val ORDER BY m)),
                         (a2, b2) -> a2 + b2) AS adc
      FROM (SELECT qd.q_id, dc.d_id, dc.m, qd.dv AS val
            FROM dcode dc JOIN qdist qd
              ON qd.cell = dc.cell AND qd.m = dc.m
             AND qd.code = dc.code
            WHERE qd.q_id <> dc.d_id)
      GROUP BY q_id, d_id
    )
    SELECT query_id, neighbor_id, round(adc, 6) AS adc,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, adc,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY adc ASC, d_id ASC) AS rk
          FROM adc)
    WHERE rk <= {k}
    """


@register("knn_ivfpq", oracle=_knn_ivfpq_oracle())
def knn_ivfpq(spark, sf_dir):
    """IVFADC (PQKNN.search_ivfpq) — the composed billion-scale ANN
    recipe: 8 pre-trained coarse cells (embeddings 200..207), corpus
    residuals PQ-encoded against the shared 8×16 codebooks, queries
    probing their 3 nearest cells with per-(query, cell) residual
    LUTs, candidates meeting on a cell equi-join and scoring with 8
    lookups each. Corpus assignment is a map-side ×8 broadcast
    expansion collapsed by a combinable max-struct aggregate (one
    shuffled row per vector); nothing scans the corpus per query.
    Fully replayed by the oracle — coarse L2 folds, residuals,
    argmin codes, ADC folds, top-k all order-pinned."""
    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cents = (emb.filter(F.col("vec_id").between(200, 207))
             .select((F.col("vec_id") - 200).alias("cell"),
                     F.col("embedding").alias("cvec")))
    cbooks = (emb.filter(F.col("vec_id") < 128)
              .select(F.expr("vec_id div 16").cast("int").alias("m"),
                      (F.col("vec_id") % 16).cast("int").alias("code"),
                      F.slice("embedding",
                              F.expr("(vec_id div 16) * 8 + 1")
                              .cast("int"), 8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 5)
    out = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
                dim=64).search_ivfpq(emb, q, cents, cbooks, nProbe=3)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


@register("knn_ivfpq_indexed", oracle=_knn_ivfpq_oracle(nProbe=2, nq=8))
def knn_ivfpq_indexed(spark, sf_dir):
    """IVFADC FROM A PERSISTED COMPOSED INDEX — the production
    big-corpus lifecycle: save_ivfpq_index writes coarse centroids +
    residual codebooks + cell-partitioned PQ codes as ONE
    manifest-pinned artifact, then search_ivfpq_with_index probes it —
    only the query-side cell ranking and residual LUTs compute fresh;
    the corpus side is the stored code table (M ints per vector, read
    cell-pruned). Same quantizers as knn_ivfpq but different queries
    (vec_id < 8) and nProbe=2, so the driver hash is an independent
    check of the stored-artifact path, not a copy."""
    import os

    from mmlspark_spark.llm.similarity import PQKNN

    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    cents = (emb.filter(F.col("vec_id").between(200, 207))
             .select((F.col("vec_id") - 200).alias("cell"),
                     F.col("embedding").alias("cvec")))
    cbooks = (emb.filter(F.col("vec_id") < 128)
              .select(F.expr("vec_id div 16").cast("int").alias("m"),
                      (F.col("vec_id") % 16).cast("int").alias("code"),
                      F.slice("embedding",
                              F.expr("(vec_id div 16) * 8 + 1")
                              .cast("int"), 8).alias("cvec")))
    q = emb.filter(F.col("vec_id") < 8)
    pq = PQKNN(idCol="vec_id", vecCol="embedding", k=10, M=8, K=16,
               dim=64)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"ivfpq_{os.path.basename(sf_dir.rstrip('/'))}")
    pq.save_ivfpq_index(emb, cents, cbooks, path)
    out = pq.search_ivfpq_with_index(pq.load_ivfpq_index(spark, path),
                                     q, nProbe=2)
    return out.select("query_id", "neighbor_id",
                      F.round("adc_dist", 6).alias("adc"),
                      F.col("rank").alias("rk"))


def _knn_ivf_oracle(nlist: int = 16, nProbe: int = 4, k: int = 10,
                    dim: int = 64, seed: int = 42) -> str:
    """Full replay of the DETERMINISTIC IVF pipeline — fit included:
    the coarse centroids are EmbeddingKMeans' hash-ranked seeds (the
    ``nlist`` lowest ids under the portable Lehmer rank, the SAME
    ranking embedding_kmeans_assign oracles), then the
    search_with_centroids replay via the shared _ivf_cte fragment —
    every float in the shared fold order."""
    cent = (f"""cr AS (
      SELECT CAST(embedding AS DOUBLE[]) AS cv,
             row_number() OVER (
               ORDER BY ((((vec_id + {seed}) % 2147483647)
                          * 48271 % 2147483647) * 48271) % 2147483647,
                        vec_id) AS rk
      FROM embeddings WHERE embedding IS NOT NULL
    ), c AS (
      SELECT CAST(rk - 1 AS INTEGER) AS cell, cv FROM cr
      WHERE rk <= {nlist}
    )""")
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), {_ivf_cte(cent, nProbe, dim)}{_ivf_topk_tail(dim, k)}"""


@register("knn_ivf", oracle=_knn_ivf_oracle())
def knn_ivf(spark, sf_dir):
    """IVF-bucketed approximate KNN with a DETERMINISTIC fit: the
    coarse quantizer is IVFKNN.fit_centroids_df (EmbeddingKMeans
    hash-ranked seeding — a distributed TakeOrderedAndProject
    collecting nlist·d floats, the driver-sized quantizer contract),
    then the pure-Catalyst search_with_centroids lane (cosine cell
    assignment via combinable max-struct, cell equi-join, exact-cosine
    top-k). Every step replays in SQL, upgrading this query from
    rows-only (r1-r9: sampled numpy Lloyd fit) to hash-exact; the
    sampled fit stays available as IVFKNN.search and keeps its recall
    assertion in tests/test_extras.py."""
    from mmlspark_spark.llm.similarity import IVFKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    ivf = IVFKNN(idCol="vec_id", vecCol="embedding", k=10,
                 nlist=16, nProbe=4, seed=42)
    out = ivf.search_with_centroids(emb, q, ivf.fit_centroids_df(emb))
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"), F.col("rank").alias("rk"))


def _knn_sq8_oracle(dim: int = 64, lv: int = 255, k: int = 10,
                    nq: int = 5, corpus_where: str = "") -> str:
    """Replays ScalarQuantizerKNN end-to-end INCLUDING the fit (the
    per-dim min/max bounds are exact aggregates, so unlike the
    sampled k-means fits this quantizer has no rows-only lane):
    uniform encode via floor(r + 0.5) with edge clamps, constant-dim
    zero codes, lo + code·Δ reconstruction, and the direct (q−x̂)²
    element-order left fold — each double in Catalyst's operation
    order. ``corpus_where`` restricts the INDEXED corpus (fit +
    scan) while queries stay unrestricted — the filtered-ANN replay
    (``knn_sq8_filtered``)."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    los = ", ".join(f"min(v[{i + 1}])" for i in range(dim))
    his = ", ".join(f"max(v[{i + 1}])" for i in range(dim))
    d2 = fold_sum("(q.v[i2] - r.recon[i2]) * (q.v[i2] - r.recon[i2])",
                  dim)
    w = f" WHERE {corpus_where}" if corpus_where else ""
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), ec AS (
      SELECT * FROM e{w}
    ), b AS (
      SELECT list_value({los}) AS lo, list_value({his}) AS hi FROM ec
    ), r AS (
      SELECT ec.vec_id, list_transform(range(1, {dim + 1}), i9 ->
               CASE WHEN b.hi[i9] = b.lo[i9] THEN b.lo[i9]
                    ELSE b.lo[i9]
                         + CAST(greatest(0.0, least({lv}.0,
                             floor((ec.v[i9] - b.lo[i9])
                                   / ((b.hi[i9] - b.lo[i9]) / {lv}.0)
                                   + 0.5))) AS INTEGER)::DOUBLE
                           * ((b.hi[i9] - b.lo[i9]) / {lv}.0)
               END) AS recon
      FROM ec, b
    ), d AS (
      SELECT q.vec_id AS q_id, r.vec_id AS d_id, {d2} AS d2
      FROM e q, r
      WHERE q.vec_id < {nq} AND q.vec_id <> r.vec_id
    )
    SELECT query_id, neighbor_id, round(d2, 6) AS sqd,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, d2,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY d2 ASC, d_id ASC) AS rk
          FROM d)
    WHERE rk <= {k}
    """


def _knn_matryoshka_oracle(dim: int = 64, dp: int = 16, cand: int = 25,
                           k: int = 10, nq: int = 5) -> str:
    """Replays truncated_rerank_search end-to-end: the dPrime-prefix
    coarse cosine (order-pinned folds, 1e-300 norm floors, sim-DESC /
    id-ASC top-C), then the exact full-dimension rerank over just the
    surviving candidates — both stages' doubles in Catalyst's
    operation order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    def cos(qv: str, dv: str, n: int) -> str:
        return (f"({fold_sum(f'{qv}[i2] * {dv}[i2]', n)})"
                f" / (greatest(sqrt({fold_sum(f'{qv}[i2] * {qv}[i2]', n)}),"
                f" 1e-300)"
                f" * greatest(sqrt({fold_sum(f'{dv}[i2] * {dv}[i2]', n)}),"
                f" 1e-300))")

    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), coarse AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, d.vec_id AS d_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos('qp', 'dp', dp)} DESC, d.vec_id ASC
               ) AS crk
        FROM (SELECT vec_id, v[1:{dp}] AS qp FROM e
              WHERE vec_id < {nq}) q,
             (SELECT vec_id, v[1:{dp}] AS dp FROM e) d
        WHERE q.vec_id <> d.vec_id)
      WHERE crk <= {cand}
    ), rer AS (
      SELECT c.q_id, c.d_id, {cos('q.v', 'd.v', dim)} AS sim
      FROM coarse c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e d ON d.vec_id = c.d_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, sim,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY sim DESC, d_id ASC) AS rk
          FROM rer)
    WHERE rk <= {k}
    """


@register("knn_matryoshka", oracle=_knn_matryoshka_oracle())
def knn_matryoshka(spark, sf_dir):
    """Matryoshka two-stage retrieval (truncated_rerank_search, MRL
    Kusupati 2022): coarse cosine over only the FIRST 16 of 64
    embedding dimensions keeps 25 candidates per query (the prefix
    fold reads 25% of the floats; at production d=1024/dPrime=64 it
    reads 6%), then an exact full-dimension rerank of just those
    25×5 candidate rows — broadcast-joined back to the corpus, never
    a second scan. Both stages are deterministic Catalyst (prefix
    slice, order-pinned folds, id tie-breaks), so the whole pipeline
    replays hash-exact."""
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = truncated_rerank_search(emb, q, dPrime=16, idCol="vec_id",
                                  vecCol="embedding", k=10,
                                  candidates=25)
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


def _knn_matryoshka_sq8_oracle(dim: int = 64, dp: int = 16,
                               cand: int = 25, k: int = 10, nq: int = 5,
                               lv: int = 255) -> str:
    """Replays truncated_rerank_search(coarse='sq8') end-to-end: exact
    per-prefix-dim [lo, hi] bounds, uniform SQ8 encode (floor(r+0.5),
    edge clamps, constant-dim zero codes) and lo + code·Δ
    reconstruction — the _knn_sq8_oracle formulas on the dp-prefix —
    then the asymmetric coarse cosine (exact query prefix vs corpus
    reconstruction, order-pinned folds, 1e-300 floors) and the exact
    full-dimension rerank, every double in Catalyst's operation
    order."""
    from mmlspark_spark.plans.duckdb_xxh import fold_sum

    def cos(qv: str, dv: str, n: int) -> str:
        return (f"({fold_sum(f'{qv}[i2] * {dv}[i2]', n)})"
                f" / (greatest(sqrt({fold_sum(f'{qv}[i2] * {qv}[i2]', n)}),"
                f" 1e-300)"
                f" * greatest(sqrt({fold_sum(f'{dv}[i2] * {dv}[i2]', n)}),"
                f" 1e-300))")

    los = ", ".join(f"min(v[{i + 1}])" for i in range(dp))
    his = ", ".join(f"max(v[{i + 1}])" for i in range(dp))
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ), b AS (
      SELECT list_value({los}) AS lo, list_value({his}) AS hi FROM e
    ), r AS (
      SELECT e.vec_id, list_transform(range(1, {dp + 1}), i9 ->
               CASE WHEN b.hi[i9] = b.lo[i9] THEN b.lo[i9]
                    ELSE b.lo[i9]
                         + CAST(greatest(0.0, least({lv}.0,
                             floor((e.v[i9] - b.lo[i9])
                                   / ((b.hi[i9] - b.lo[i9]) / {lv}.0)
                                   + 0.5))) AS INTEGER)::DOUBLE
                           * ((b.hi[i9] - b.lo[i9]) / {lv}.0)
               END) AS recon
      FROM e, b
    ), coarse AS (
      SELECT q_id, d_id FROM (
        SELECT q.vec_id AS q_id, r.vec_id AS d_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY {cos('q.qp', 'r.recon', dp)} DESC,
                          r.vec_id ASC) AS crk
        FROM (SELECT vec_id, v[1:{dp}] AS qp FROM e
              WHERE vec_id < {nq}) q, r
        WHERE q.vec_id <> r.vec_id)
      WHERE crk <= {cand}
    ), rer AS (
      SELECT c.q_id, c.d_id, {cos('q.v', 'd.v', dim)} AS sim
      FROM coarse c
      JOIN e q ON q.vec_id = c.q_id
      JOIN e d ON d.vec_id = c.d_id
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS sim,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT q_id AS query_id, d_id AS neighbor_id, sim,
                 row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY sim DESC, d_id ASC) AS rk
          FROM rer)
    WHERE rk <= {k}
    """


@register("knn_matryoshka_sq8", oracle=_knn_matryoshka_sq8_oracle())
def knn_matryoshka_sq8(spark, sf_dir):
    """Matryoshka-over-SQ8 — the composed production recipe
    (truncated_rerank_search(coarse='sq8')): the coarse stage scores
    the exact query prefix against the SQ8-RECONSTRUCTED corpus prefix
    (exact bounds fit on the 16-dim prefix, uint8 codes, lo + code·Δ),
    so a stored coarse index is 8× smaller than the float prefix —
    0.8% of full-float bytes at d=1024/dPrime=64/bits=8 — and the
    exact full-dimension rerank caps the recall cost. Deterministic
    fit → the whole composition replays hash-exact."""
    from mmlspark_spark.llm.similarity import truncated_rerank_search

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = truncated_rerank_search(emb, q, dPrime=16, idCol="vec_id",
                                  vecCol="embedding", k=10,
                                  candidates=25, coarse="sq8")
    return out.select("query_id", "neighbor_id",
                      F.round("sim", 6).alias("sim"),
                      F.col("rank").alias("rk"))


@register("knn_sq8", oracle=_knn_sq8_oracle())
def knn_sq8(spark, sf_dir):
    """Scalar-quantization ANN (ScalarQuantizerKNN, faiss SQ8
    family): 64-dim embeddings compressed to 64 uint8 codes between
    exact per-dimension corpus [lo, hi] bounds (ONE map-combined
    aggregate pass, a single 2d-double row out), then asymmetric
    top-10 for 5 queries — exact query vs on-the-fly lo + code·Δ
    reconstruction, squared-L2 left fold, corpus-side under a
    broadcast query cross join. The fit is exact min/max, so the
    whole fit→encode→search pipeline replays hash-exact — the only
    quantized-ANN lane with an oracled fit."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    out = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding",
                             k=10, bits=8, dim=64).search(emb, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sq_dist", 6).alias("sqd"),
                      F.col("rank").alias("rk"))


@register("knn_sq8_filtered",
          oracle=_knn_sq8_oracle(corpus_where="vec_id >= 200"))
def knn_sq8_filtered(spark, sf_dir):
    """FILTERED ANN — metadata predicate composed under the quantized
    search, the production 'search only docs matching X' shape: the
    corpus filter (vec_id >= 200, a plain range predicate) sits BELOW
    the fit and the scan, so it pushes to the parquet reader
    (row-group skipping) and the SQ bounds are fitted on exactly the
    searchable subset — filtered-index semantics (like faiss
    IDSelector applied at build), not post-filtering of results,
    which silently returns < k rows. Queries stay unrestricted.
    Deterministic fit → the filtered pipeline replays hash-exact."""
    from mmlspark_spark.llm.similarity import ScalarQuantizerKNN

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    corpus = emb.filter(F.col("vec_id") >= 200)
    out = ScalarQuantizerKNN(idCol="vec_id", vecCol="embedding",
                             k=10, bits=8, dim=64).search(corpus, q)
    return out.select("query_id", "neighbor_id",
                      F.round("sq_dist", 6).alias("sqd"),
                      F.col("rank").alias("rk"))


# ---------------------------------------------------------------------------
# ML pipeline queries (SURVEY §2.10 train/eval surface)
# ---------------------------------------------------------------------------

@register(
    "unicode_normalize",
    oracle="""
    SELECT doc_id, lower(nfc_normalize(text)) AS norm
    FROM documents WHERE doc_id < 2000
    """,
)
def unicode_normalize(spark, sf_dir):
    """UnicodeNormalize stage (stages/UnicodeNormalize.scala): NFC +
    lowercase, mirrored by DuckDB's nfc_normalize."""
    from mmlspark_spark.featurize import UnicodeNormalize

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 2000)
    out = UnicodeNormalize(inputCol="text", outputCol="norm", form="NFC",
                           lower=True).transform(docs)
    return out.select("doc_id", "norm")


@register(
    "train_classifier_metrics",
    oracle="""
    SELECT CAST(1.0 AS DOUBLE) AS accuracy, CAST(1.0 AS DOUBLE) AS precision,
           CAST(1.0 AS DOUBLE) AS recall, CAST(1.0 AS DOUBLE) AS AUC,
           CAST(sum(CASE WHEN l_extendedprice > 35000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           CAST(sum(CASE WHEN l_extendedprice < 25000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_neg
    FROM lineitem
    WHERE l_extendedprice > 35000 OR l_extendedprice < 25000
    """,
)
def train_classifier_metrics(spark, sf_dir):
    """TrainClassifier + ComputeModelStatistics end-to-end. The label is
    a wide-margin price threshold (positive above 35k, negative below
    25k, gap rows dropped), so a correctly trained model's metrics are
    closed-form — accuracy/precision/recall/AUC all exactly 1.0 — and
    the whole train→score→evaluate path is hash-checked: a model that
    fails to separate the 10k-wide margin fails the oracle. n_pos/n_neg
    tie the check to the actual data selection. Golden-metric
    tolerances on a non-separable task stay in tests/test_ml.py."""
    from mmlspark_spark.ml import ComputeModelStatistics, TrainClassifier

    li = (_t(spark, sf_dir, "lineitem")
          .select("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .filter((F.col("l_extendedprice") > 35000)
                  | (F.col("l_extendedprice") < 25000))
          .withColumn("label",
                      (F.col("l_extendedprice") > 35000).cast("double")))
    from pyspark.ml.classification import LogisticRegression

    model = TrainClassifier(model=LogisticRegression(), labelCol="label")\
        .fit(li)
    scored = model.transform(li)
    stats = ComputeModelStatistics(evaluationMetric="classification")\
        .transform(scored)
    counts = li.agg(
        F.sum(F.col("label").cast("bigint")).alias("n_pos"),
        F.sum((1 - F.col("label")).cast("bigint")).alias("n_neg"))
    return stats.select([F.round(F.col(c), 4).alias(c)
                         for c in stats.columns]).crossJoin(counts)


def _vw_featurizer_oracle() -> str:
    """Replays the default VowpalWabbitFeaturizer path (Spark
    FeatureHasher: murmur3_x86_32 seed 42 of ``col=value`` for strings
    / the bare column name for numerics, ``nonNegativeMod`` into 2^12
    slots) with the plans/duckdb_xxh murmur32 generator — the SLOT
    INDICES are part of the compared output, so the hash itself is
    verified, not just the value mass."""
    from mmlspark_spark.plans.duckdb_xxh import murmur32_str, nonneg_mod32

    i_flag = nonneg_mod32(
        murmur32_str("'l_returnflag=' || l_returnflag", u="ya"), 4096)
    i_status = nonneg_mod32(
        murmur32_str("'l_linestatus=' || l_linestatus", u="yb"), 4096)
    i_qty = nonneg_mod32(murmur32_str("'sum_qty'", u="yc"), 4096)
    return f"""
    WITH a AS (
      SELECT l_returnflag, l_linestatus,
             CAST(count(*) AS BIGINT) AS n,
             round(sum(l_quantity), 4) AS sum_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus, n, sum_qty,
           array_to_string(list_sort([{i_flag}, {i_status}, {i_qty}]),
                           ',') AS slots,
           round(2.0 + sum_qty, 4) AS slot_sum
    FROM a
    """


@register("vw_featurizer", oracle=_vw_featurizer_oracle())
def vw_featurizer(spark, sf_dir):
    """VowpalWabbitFeaturizer hashing, HASH-EXACT against a DuckDB
    oracle that recomputes the murmur3_x86_32 slot layout bit-for-bit
    (plans/duckdb_xxh.murmur32_str; rows-only before round 8). The
    query aggregates lineitem per (returnflag, linestatus), featurizes
    the aggregate frame, and exposes the NONZERO SLOT INDICES plus the
    slot value mass — so index placement, not just totals, is driver-
    verified. VW-hash-parity (useVWHashing) additionally golden-tested
    in tests/test_murmur.py against the JVM."""
    from pyspark.ml.functions import vector_to_array

    from mmlspark_spark.ml.vw import VowpalWabbitFeaturizer

    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    out = VowpalWabbitFeaturizer(
        inputCols=["l_returnflag", "l_linestatus", "sum_qty"],
        outputCol="features", numBits=12).transform(agg)
    arr = vector_to_array("features")
    nz = F.filter(
        F.transform(arr, lambda v, i: F.struct(i.alias("i"), v.alias("v"))),
        lambda s: s["v"] != 0)
    return out.select(
        "l_returnflag", "l_linestatus", "n", "sum_qty",
        F.concat_ws(",", F.transform(nz, lambda s: s["i"].cast("string")))
        .alias("slots"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, v: a + v), 4)
        .alias("slot_sum"))


# ---------------------------------------------------------------------------
# Temporal joins (engine extras — reference has none, SURVEY §2.3)
# ---------------------------------------------------------------------------

@register(
    "asof_join",
    oracle="""
    SELECT c.event_id, c.user_id,
           s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON c.user_id = s.user_id AND c.ts >= s.ts
    """,
)
def asof_join(spark, sf_dir):
    """Backward as-of join: each click matched to the user's most recent
    signup at-or-before it — one union + one window pass per user, a
    single shuffle (no per-row range probe). Spark has no ASOF JOIN;
    DuckDB's native ASOF is the oracle."""
    from mmlspark_spark.operators.temporal import as_of_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    out = as_of_join(clicks, signups, on="user_id",
                     leftTimeCol="ts", rightTimeCol="ts",
                     rightCols=[], suffix="_signup")
    return out.select("event_id", "user_id",
                      F.col("ts_signup").alias("signup_ts"))


@register(
    "range_join",
    oracle="""
    SELECT p.event_id AS purchase_id, e.event_id AS error_id,
           p.user_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id
     AND e.ts >= p.ts
     AND epoch(e.ts) - epoch(p.ts) <= 3600
    """,
)
def range_join_q(spark, sf_dir):
    """Range join: errors within 1 h after each purchase by the same
    user — bucketed equi-join + exact filter, instead of the
    broadcast-nested-loop Spark plans for raw inequality joins."""
    from mmlspark_spark.operators.temporal import range_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts")
    out = range_join(purchases, errors, on="user_id",
                     leftTimeCol="ts", rightTimeCol="ts",
                     lower=0.0, upper=3600.0)
    return out.select(F.col("event_id").alias("purchase_id"),
                      F.col("event_id_right").alias("error_id"),
                      "user_id")


@register(
    "cube_counts",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 4) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark, sf_dir):
    """CUBE aggregation (SURVEY §2.4: grouping sets come free from
    Catalyst — df.cube); complements rollup_counts."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("qty"),
    )


@register(
    "stratified_repartition",
    oracle="""
    WITH cnt AS (
      SELECT l_returnflag, count(*) AS c FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, (SELECT max(c) FROM cnt) AS n FROM cnt
    """,
)
def stratified_repartition(spark, sf_dir):
    """StratifiedRepartition equal mode (stages/StratifiedRepartition.scala:
    48-77): every label resampled with replacement to max(maxLabelCount,
    parallelism) rows, interleaved across partitions. At sf0.01 the max
    label count dominates parallelism, so per-label output counts are
    exactly the max label count — SQL-expressible."""
    from mmlspark_spark.operators import StratifiedRepartition

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    out = StratifiedRepartition(labelCol="l_returnflag", mode="equal",
                                seed=42).transform(li)
    return out.groupBy("l_returnflag").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Stage-family coverage queries (round 2): operators that previously had
# only unit tests get driver-checkable oracle rows.
# ---------------------------------------------------------------------------


@register(
    "lambda_stage",
    oracle="""
    SELECT o_orderkey,
           round(CAST(o_totalprice AS DOUBLE) * 0.9, 4) AS discounted
    FROM orders WHERE o_totalprice > 100000
    """,
)
def lambda_stage(spark, sf_dir):
    """Lambda stage wrapping an arbitrary DataFrame->DataFrame function
    (stages/Lambda.scala:22-60): the wrapped plan stays fully
    declarative, so Catalyst pushes the filter into the scan."""
    from mmlspark_spark.operators import Lambda

    orders = _t(spark, sf_dir, "orders")
    stage = Lambda(fn=lambda df: df
                   .filter(F.col("o_totalprice") > 100000)
                   .select("o_orderkey",
                           F.round(F.col("o_totalprice").cast("double") * 0.9,
                                   4).alias("discounted")))
    return stage.transform(orders)


@register(
    "udf_transformer",
    oracle="""
    SELECT c_custkey, CAST(length(c_name) AS INT) AS name_len
    FROM customer
    """,
)
def udf_transformer(spark, sf_dir):
    """UDFTransformer with an Arrow-vectorized pandas UDF
    (stages/UDFTransformer.scala:26-110) — the python hot path runs per
    Arrow batch, never per row."""
    from pyspark.sql.functions import pandas_udf

    from mmlspark_spark.operators import UDFTransformer

    @pandas_udf("int")
    def _name_len(s):
        return s.str.len().astype("int32")

    cust = _t(spark, sf_dir, "customer")
    out = UDFTransformer(inputCols=["c_name"], outputCol="name_len",
                         udf=_name_len).transform(cust)
    return out.select("c_custkey", "name_len")


@register(
    "multi_column_adapter",
    oracle="""
    SELECT c_custkey, lower(c_name) AS name_n, lower(c_mktsegment) AS seg_n
    FROM customer
    """,
)
def multi_column_adapter(spark, sf_dir):
    """MultiColumnAdapter cloning a one-in-one-out base stage per
    (in, out) pair (stages/MultiColumnAdapter.scala:20-135); base stage
    is UnicodeNormalize (NFKC + lower)."""
    from mmlspark_spark.featurize import UnicodeNormalize
    from mmlspark_spark.operators import MultiColumnAdapter

    cust = _t(spark, sf_dir, "customer")
    out = MultiColumnAdapter(
        baseStage=UnicodeNormalize(form="NFKC", lower=True),
        inputCols=["c_name", "c_mktsegment"],
        outputCols=["name_n", "seg_n"]).transform(cust)
    return out.select("c_custkey", "name_n", "seg_n")


@register(
    "drop_missing",
    oracle="""
    SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 7 <> 0
    """,
)
def drop_missing(spark, sf_dir):
    """DropMissingData on a column with injected nulls (reference drops
    NA inside Featurize.scala:181; promoted to a stage here)."""
    from mmlspark_spark.operators import DropMissingData

    orders = _t(spark, sf_dir, "orders").withColumn(
        "maybe", F.when(F.col("o_orderkey") % 7 != 0, F.col("o_orderstatus")))
    out = DropMissingData(cols=["maybe"]).transform(orders)
    return out.select("o_orderkey", F.col("maybe").alias("o_orderstatus"))


@register(
    "minibatch_roundtrip",
    oracle="""
    SELECT event_id, user_id, event_type,
           round(CAST(value AS DOUBLE), 6) AS value
    FROM events WHERE event_id < 20000
    """,
)
def minibatch_roundtrip(spark, sf_dir):
    """FixedMiniBatchTransformer then FlattenBatch
    (stages/MiniBatchTransformer.scala:130-230) is an exact identity —
    the oracle checks no row is lost, duplicated, or reassociated
    across the batch/unbatch round trip."""
    from mmlspark_spark.operators import (
        FixedMiniBatchTransformer,
        FlattenBatch,
    )

    ev = _t(spark, sf_dir, "events").filter(F.col("event_id") < 20000) \
        .select("event_id", "user_id", "event_type",
                F.round(F.col("value").cast("double"), 6).alias("value"))
    batched = FixedMiniBatchTransformer(batchSize=100).transform(ev)
    return FlattenBatch().transform(batched)


@register(
    "partition_ops_identity",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_quantity AS DOUBLE), 4) AS qty
    FROM lineitem WHERE l_orderkey < 1000
    """,
)
def partition_ops_identity(spark, sf_dir):
    """Repartition (shuffle), PartitionConsolidator (coalesce), Cacher
    and Timer are content-preserving by contract
    (stages/Repartition.scala:20-66, PartitionConsolidator.scala:22-139,
    Cacher.scala:14-43, Timer.scala:55-133) — the oracle proves the
    composed chain changes partitioning only, never data."""
    from mmlspark_spark.operators import (
        Cacher,
        PartitionConsolidator,
        Repartition,
        Timer,
    )
    from mmlspark_spark.operators.stages import SelectColumns

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000) \
        .select("l_orderkey", "l_linenumber",
                F.round(F.col("l_quantity").cast("double"), 4).alias("qty"))
    out = Repartition(n=8, useRepartition=True).transform(li)
    out = PartitionConsolidator(numPartitions=2).transform(out)
    out = Cacher().transform(out)
    timed = Timer(stage=SelectColumns(cols=["l_orderkey", "l_linenumber",
                                            "qty"]))
    return timed.transform(out)


@register(
    "date_featurize",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS DOUBLE) AS yr,
           CAST(dayofweek(o_orderdate) + 1 AS DOUBLE) AS dow,
           CAST(month(o_orderdate) AS DOUBLE) AS mo,
           CAST(day(o_orderdate) AS DOUBLE) AS dom
    FROM orders WHERE o_orderkey < 30000
    """,
)
def date_featurize(spark, sf_dir):
    """date_features component extraction (Featurize.scala:204-215);
    DuckDB's dayofweek is 0-based Sunday vs Spark's 1-based, hence the
    +1 on the oracle side."""
    from mmlspark_spark.featurize.auto import date_features

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 30000)
    feats = date_features(F.col("o_orderdate"))
    return orders.select(
        "o_orderkey",
        feats[1].alias("yr"), feats[2].alias("dow"),
        feats[3].alias("mo"), feats[4].alias("dom"))


@register(
    "index_to_value_roundtrip",
    oracle="SELECT c_custkey, c_mktsegment AS restored FROM customer",
)
def index_to_value_roundtrip(spark, sf_dir):
    """ValueIndexer -> IndexToValue is an exact inverse: the levels ride
    the indexed column's metadata (featurize/IndexToValue.scala:29-92),
    so the round trip restores every original value."""
    from mmlspark_spark.featurize import IndexToValue, ValueIndexer

    cust = _t(spark, sf_dir, "customer")
    model = ValueIndexer(inputCol="c_mktsegment", outputCol="seg_idx").fit(cust)
    idx = model.transform(cust)
    out = IndexToValue(inputCol="seg_idx", outputCol="restored").transform(idx)
    return out.select("c_custkey", "restored")


@register(
    "count_selector",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(CAST(l_quantity AS DOUBLE), 4) AS q,
           round(CAST(l_tax AS DOUBLE), 4) AS t
    FROM lineitem WHERE l_orderkey < 2000
    """,
)
def count_selector(spark, sf_dir):
    """CountSelector drops all-zero vector slots
    (featurize/CountSelector.scala:23-88): a planted zero slot between
    two real features disappears, leaving exactly (quantity, tax)."""
    from mmlspark_spark.featurize.auto import CountSelector
    from mmlspark_spark.functions.vector import get_value_at, to_vector

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    vec = li.withColumn("features", to_vector(F.array(
        F.col("l_quantity").cast("double"), F.lit(0.0),
        F.col("l_tax").cast("double"))))
    model = CountSelector(inputCol="features", outputCol="selected").fit(vec)
    out = model.transform(vec)
    return out.select(
        "l_orderkey", "l_linenumber",
        F.round(get_value_at("selected", 0), 4).alias("q"),
        F.round(get_value_at("selected", 1), 4).alias("t"))


@register(
    "text_preprocessor",
    oracle="""
    SELECT doc_id,
           replace(replace(lower(text), 'data', '<DATA>'),
                   'model', '<MODEL>') AS processed
    FROM documents
    """,
)
def text_preprocessor(spark, sf_dir):
    """TextPreprocessor longest-match-first multi-replacement
    (stages/TextPreprocessor.scala:98-152). The chosen patterns are
    mutually disjoint and replacements share no alphabet with any
    pattern, so the one-pass alternation is provably equal to DuckDB's
    sequential replace() chain."""
    from mmlspark_spark.featurize import TextPreprocessor

    docs = _t(spark, sf_dir, "documents")
    out = TextPreprocessor(
        inputCol="text", outputCol="processed", normFunc="lower",
        map={"data": "<DATA>", "model": "<MODEL>"}).transform(docs)
    return out.select("doc_id", "processed")


@register(
    "per_instance_log_loss",
    oracle="""
    SELECT o_orderkey,
           round(-ln(CASE WHEN o_orderkey % 2 = 1
                          THEN greatest(least((o_orderkey % 97) / 100.0,
                                              1 - 1e-15), 1e-15)
                          ELSE greatest(least(1 - (o_orderkey % 97) / 100.0,
                                              1 - 1e-15), 1e-15) END),
                 6) AS log_loss
    FROM orders WHERE o_orderkey < 20000
    """,
)
def per_instance_log_loss(spark, sf_dir):
    """ComputePerInstanceStatistics classification log-loss from scored
    probabilities (ComputePerInstanceStatistics.scala:77-99), expressed
    as pure column math over a deterministic synthetic scoring."""
    from mmlspark_spark.functions.vector import to_vector
    from mmlspark_spark.ml import ComputePerInstanceStatistics

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    p = (F.col("o_orderkey") % 97).cast("double") / 100.0
    scored = orders.select(
        "o_orderkey",
        (F.col("o_orderkey") % 2).cast("double").alias("label"),
        to_vector(F.array(1 - p, p)).alias("scored_probabilities"))
    out = ComputePerInstanceStatistics(
        evaluationMetric="classification", labelCol="label").transform(scored)
    return out.select("o_orderkey", F.round("log_loss", 6).alias("log_loss"))


@register(
    "model_statistics",
    oracle="""
    WITH scored AS (
      SELECT CAST(o_orderkey % 2 AS DOUBLE) AS y,
             (o_orderkey % 97) / 100.0 AS s,
             CASE WHEN (o_orderkey % 97) / 100.0 >= 0.5
                  THEN 1.0 ELSE 0.0 END AS p
      FROM orders WHERE o_orderkey < 20000
    ),
    ranked AS (
      SELECT y, s, row_number() OVER (ORDER BY s) AS r FROM scored
    ),
    ravg AS (
      SELECT y, avg(r) OVER (PARTITION BY s) AS ra FROM ranked
    ),
    aucagg AS (
      SELECT sum(ra) FILTER (y = 1.0) AS rpos,
             count(*) FILTER (y = 1.0) AS npos,
             count(*) FILTER (y <> 1.0) AS nneg
      FROM ravg
    ),
    cm AS (
      SELECT count(*) FILTER (y = 1 AND p = 1) AS tp1,
             count(*) FILTER (y = 0 AND p = 0) AS tp0,
             count(*) FILTER (p = 1) AS pred1,
             count(*) FILTER (p = 0) AS pred0,
             count(*) FILTER (y = 1) AS lab1,
             count(*) FILTER (y = 0) AS lab0,
             count(*) AS n
      FROM scored
    )
    SELECT round((tp0 + tp1) / CAST(n AS DOUBLE), 6) AS accuracy,
           round((CAST(tp0 AS DOUBLE) / pred0
                  + CAST(tp1 AS DOUBLE) / pred1) / 2, 6) AS macro_precision,
           round((CAST(tp0 AS DOUBLE) / lab0
                  + CAST(tp1 AS DOUBLE) / lab1) / 2, 6) AS macro_recall,
           round((rpos - npos * (npos + 1) / 2.0)
                 / (npos * nneg), 6) AS auc
    FROM cm, aucagg
    """,
)
def model_statistics(spark, sf_dir):
    """ComputeModelStatistics over a deterministic synthetic scoring
    (ComputeModelStatistics.scala analog, mmlspark_spark/ml/stats.py):
    accuracy + macro precision/recall from the confusion matrix and
    AUROC via the tie-averaged Mann-Whitney rank statistic — the oracle
    reproduces the rank math in SQL, so the AUC implementation itself
    is hash-checked."""
    from mmlspark_spark.functions.vector import to_vector
    from mmlspark_spark.ml import ComputeModelStatistics

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    s = (F.col("o_orderkey") % 97).cast("double") / 100.0
    scored = orders.select(
        (F.col("o_orderkey") % 2).cast("double").alias("label"),
        F.when(s >= 0.5, 1.0).otherwise(0.0).alias("scored_labels"),
        to_vector(F.array(1 - s, s)).alias("scored_probabilities"))
    out = ComputeModelStatistics(labelCol="label").transform(scored)
    return out.select(
        F.round("accuracy", 6).alias("accuracy"),
        F.round("precision", 6).alias("macro_precision"),
        F.round("recall", 6).alias("macro_recall"),
        F.round("AUC", 6).alias("auc"))


@register(
    "ranking_metrics",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN o_orderkey % 3 = 0 THEN 1.0 ELSE 0.0 END AS h1,
             CASE WHEN o_orderkey % 2 = 0 THEN 1.0 ELSE 0.0 END AS h2
      FROM orders WHERE o_orderkey < 20000
    ),
    m AS (
      SELECT (h1 + h2) / 3.0 AS prec,
             (h1 + h2) / 2.0 AS rec,
             (h1 + h2 / log2(3.0)) / (1.0 + 1.0 / log2(3.0)) AS ndcg,
             (h1 + CASE WHEN h2 = 1 THEN (h1 + h2) / 2.0
                        ELSE 0.0 END) / 2.0 AS ap
      FROM t
    )
    SELECT round(avg(prec), 6) AS precision_at_k,
           round(avg(rec), 6) AS recall_at_k,
           round(avg(ndcg), 6) AS ndcg_at_k,
           round(avg(ap), 6) AS mean_ap
    FROM m
    """,
)
def ranking_metrics(spark, sf_dir):
    """RankingEvaluator (recommendation/RankingMetrics analog) over
    deterministic prediction/label arrays built so every positional
    hit is a closed-form function of the order key — precision/recall/
    NDCG/MAP@3 all reduce to SQL the oracle replicates exactly."""
    from mmlspark_spark.ml import RankingEvaluator

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    o = F.col("o_orderkey")
    df = orders.select(
        F.array(o % 5, o % 3 + 5, o % 2 + 10).alias("prediction"),
        F.array(
            F.when(o % 3 == 0, o % 5).otherwise(F.lit(50)),
            F.when(o % 2 == 0, o % 3).otherwise((o + 1) % 3) + 5,
        ).alias("label"))
    got = RankingEvaluator(k=3).evaluate(df)
    return spark.createDataFrame(
        [(round(got["precisionAtK"], 6), round(got["recallAtK"], 6),
          round(got["ndcgAt"], 6), round(got["map"], 6))],
        "precision_at_k double, recall_at_k double, ndcg_at_k double, "
        "mean_ap double")


@register(
    "featurize_numeric",
    oracle="""
    WITH src AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 <> 0
                  THEN CAST(c_acctbal AS DOUBLE) END AS bal
      FROM customer
    )
    SELECT c_custkey,
           round(coalesce(bal, (SELECT avg(bal) FROM src)), 4) AS f0
    FROM src
    """,
)
def featurize_numeric(spark, sf_dir):
    """Featurize auto-pipeline, numeric path (Featurize.scala:
    mean-impute + assemble): nulls planted on every 10th customer must
    come back as the fit-data mean, checked against DuckDB's avg."""
    from mmlspark_spark.featurize import Featurize
    from mmlspark_spark.functions.vector import get_value_at

    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 != 0,
               F.col("c_acctbal").cast("double")).alias("bal"))
    model = Featurize(inputCols=["bal"], outputCol="features").fit(cust)
    out = model.transform(cust)
    return out.select(
        "c_custkey", F.round(get_value_at("features", 0), 4).alias("f0"))


@register(
    "tabular_shap_exact",
    oracle="""
    WITH b AS (
      SELECT l_quantity AS bq, l_discount AS bd, l_tax AS bt
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 1
    ),
    p AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 10
    )
    SELECT l_orderkey, l_linenumber,
           round(2 * bq + 10 * bd - 3 * bt, 4) + 0 AS base,
           round(2 * (l_quantity - bq), 4) + 0 AS phi_q,
           round(10 * (l_discount - bd), 4) + 0 AS phi_d,
           round(-3 * (l_tax - bt), 4) + 0 AS phi_t
    FROM p, b
    """,
)
def tabular_shap_exact(spark, sf_dir):
    """KernelSHAP in EXACT mode (complete coalition enumeration when
    2^m - 2 <= numSamples) over a linear model with a single background
    row — Shapley values are then closed-form (phi_i = w_i (x_i - b_i),
    base = f(b)), so the whole explainer path is hash-checked against
    SQL, not just rows-counted."""
    from mmlspark_spark.explainers import TabularSHAP
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    ordered = li.orderBy("l_orderkey", "l_linenumber")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        2.0 * F.col("l_quantity") + 10.0 * F.col("l_discount")
        - 3.0 * F.col("l_tax")))
    shap = TabularSHAP(
        model=model, inputCols=["l_quantity", "l_discount", "l_tax"],
        backgroundData=ordered.limit(1), targetCol="prediction",
        numSamples=64, seed=7)
    out = shap.transform(ordered.limit(10))
    # "+ 0" on both sides canonicalizes IEEE -0.0 to 0.0 (DuckDB's
    # round keeps the sign of zero; the driver value-hash is
    # repr-sensitive, so -0.0 vs 0.0 is a hash miss).
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.round(F.col("shapValues")[0], 4) + 0).alias("base"),
        (F.round(F.col("shapValues")[1], 4) + 0).alias("phi_q"),
        (F.round(F.col("shapValues")[2], 4) + 0).alias("phi_d"),
        (F.round(F.col("shapValues")[3], 4) + 0).alias("phi_t"))


@register(
    "tabular_lime_exact",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(2.0 AS DOUBLE) AS w_q,
           CAST(10.0 AS DOUBLE) AS w_d,
           CAST(-3.0 AS DOUBLE) AS w_t,
           CAST(1.0 AS DOUBLE) AS r2
    FROM (SELECT l_orderkey, l_linenumber FROM lineitem
          ORDER BY l_orderkey, l_linenumber LIMIT 10)
    """,
)
def tabular_lime_exact(spark, sf_dir):
    """TabularLIME in its analytically-solvable regime: zero
    regularization degenerates the per-id lasso to weighted least
    squares, and on an exactly-LINEAR model WLS recovers the model's
    own coefficients for ANY sample draw and ANY kernel weights (the
    64-sample Gaussian design is full-rank over 3 features), with
    r² = 1. The whole sample→score→solve→join dataflow — the same
    pipeline the rows-only ``tabular_lime`` exercises with a
    non-linear model — is therefore hash-checked against its closed
    form, mirroring ``tabular_shap_exact``'s complete-enumeration
    mode. Reference LIMEBase.scala:95-114 (the per-id weighted solve,
    regularization param included)."""
    from mmlspark_spark.explainers import TabularLIME
    from mmlspark_spark.operators import Lambda

    li = _t(spark, sf_dir, "lineitem")
    ordered = li.orderBy("l_orderkey", "l_linenumber")
    model = Lambda(fn=lambda df: df.withColumn(
        "prediction",
        2.0 * F.col("l_quantity") + 10.0 * F.col("l_discount")
        - 3.0 * F.col("l_tax")))
    lime = TabularLIME(
        model=model, inputCols=["l_quantity", "l_discount", "l_tax"],
        backgroundData=ordered.limit(200), targetCol="prediction",
        numSamples=64, regularization=0.0, seed=7)
    out = lime.transform(ordered.limit(10))
    # "+ 0" canonicalizes IEEE -0.0 (see tabular_shap_exact)
    return out.select(
        "l_orderkey", "l_linenumber",
        (F.round(F.col("explanation")[0], 4) + 0).alias("w_q"),
        (F.round(F.col("explanation")[1], 4) + 0).alias("w_d"),
        (F.round(F.col("explanation")[2], 4) + 0).alias("w_t"),
        (F.round(F.col("r2"), 6) + 0).alias("r2"))


@register(
    "sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS INT) AS n_tokens,
             doc_id % 8 AS shard
      FROM documents
    ),
    placed AS (
      SELECT doc_id, n_tokens, shard,
             coalesce(sum(n_tokens) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS cum_before
      FROM toks
    )
    SELECT doc_id, n_tokens, shard,
           CAST(floor(cum_before / 512.0) AS BIGINT) AS seq_index,
           -- windowed sum is HUGEINT in DuckDB; without the cast the
           -- modulo surfaces as float64 and value-hashes differently
           -- from Spark's int64
           CAST(cum_before % 512 AS BIGINT) AS seq_offset
    FROM placed
    """,
)
def sequence_packing(spark, sf_dir):
    """SequencePacker: concatenate-then-chunk pretraining layout — each
    doc's (shard, window, offset) placement from a per-shard window
    cumsum; the oracle replicates the whole placement in SQL."""
    from mmlspark_spark.llm import SequencePacker

    docs = _t(spark, sf_dir, "documents")
    out = SequencePacker(idCol="doc_id", textCol="text",
                         maxTokens=512, numShards=8).transform(docs)
    return out.select("doc_id", "n_tokens", "shard", "seq_index",
                      "seq_offset")


@register(
    "decontamination",
    oracle="""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 8 THEN
               list_transform(range(1, len(t) - 6),
                 i -> array_to_string(list_slice(t, i, i + 7), ' '))
             ELSE CAST([] AS VARCHAR[]) END) AS shingles
      FROM tok
    ),
    bench AS (
      SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id < 50
    ),
    corpus AS (
      SELECT doc_id, unnest(shingles) AS s FROM sh WHERE doc_id >= 50
    ),
    cnt AS (
      SELECT c.doc_id, count(*) AS n
      FROM corpus c JOIN bench b ON c.s = b.s GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(coalesce(cnt.n, 0) AS INT) AS contaminated_count,
           coalesce(cnt.n, 0) >= 1 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id >= 50) d
    LEFT JOIN cnt USING (doc_id)
    """,
)
def decontamination(spark, sf_dir):
    """BenchmarkDecontaminator: corpus docs sharing >= 1 distinct word
    8-gram with the benchmark split (doc_id < 50 stands in for an eval
    suite) are flagged. The oracle recomputes the shingle intersection
    with string shingles — matching the engine's hashed-shingle counts
    exactly (64-bit collisions aside)."""
    from mmlspark_spark.llm import BenchmarkDecontaminator

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 50)
    corpus = docs.filter(F.col("doc_id") >= 50)
    out = BenchmarkDecontaminator(
        benchmarkData=bench, idCol="doc_id", textCol="text",
        n=8, minShingles=1).transform(corpus)
    return out.select("doc_id", "contaminated_count", "contaminated")


@register(
    "repetition_metrics",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, chr(10)),
                         x -> x <> '') AS lines,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ),
    grams AS (
      SELECT doc_id, lines,
             CASE WHEN len(t) >= 5 THEN
               list_transform(range(1, len(t) - 3),
                 i -> array_to_string(list_slice(t, i, i + 4), ' '))
             ELSE CAST([] AS VARCHAR[]) END AS g5
      FROM base
    )
    SELECT doc_id,
           round(CASE WHEN len(lines) > 0 THEN
             (len(lines) - len(list_distinct(lines)))
               / CAST(len(lines) AS DOUBLE) ELSE 0.0 END, 6)
             AS dup_line_frac,
           round(CASE WHEN len(g5) > 0 THEN
             (len(g5) - len(list_distinct(g5)))
               / CAST(len(g5) AS DOUBLE) ELSE 0.0 END, 6)
             AS dup_5gram_frac
    FROM grams
    """,
)
def repetition_metrics(spark, sf_dir):
    """Gopher-style repetition signals over documents: duplicate-line
    and duplicate-5-gram fractions, both single-map expressions (zero
    shuffle over 100 TB) with an exact SQL replica as oracle."""
    from mmlspark_spark.functions.text_quality import (
        dup_line_fraction,
        dup_ngram_fraction,
    )

    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(dup_line_fraction("text"), 6).alias("dup_line_frac"),
        F.round(dup_ngram_fraction("text", 5), 6).alias("dup_5gram_frac"))


@register(
    "pii_redact",
    oracle=r"""
    SELECT doc_id,
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        text || ' contact user' || doc_id
             || '@example.com or 555-867-5309, host 10.0.'
             || (doc_id % 256) || '.7',
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
        '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g') AS redacted
    FROM documents WHERE doc_id < 1000
    """,
)
def pii_redact(spark, sf_dir):
    """PII scrub stage (training-pipeline extras): emails / SSNs /
    phones / IPv4s replaced by redaction tokens, as a pure map-only
    regexp chain. PII is PLANTED per row (the synthetic corpus has
    none) so the oracle exercises real redaction, not an identity."""
    from mmlspark_spark.llm import PIIRedactor

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-867-5309, host 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("text"))
    out = PIIRedactor(textCol="text", outputCol="redacted").transform(planted)
    return out.select("doc_id", "redacted")


@register(
    "url_extract",
    oracle=r"""
    SELECT doc_id,
      array_to_string(regexp_extract_all(
        'see https://site' || (doc_id % 10)
          || '.example.org/p?x=1 and http://cdn.example.net/img ' || text,
        'https?://(?:[^/\s@]+@)?([^/\s:@]+)', 1), ' ') AS domains
    FROM documents WHERE doc_id < 1000
    """,
)
def url_extract(spark, sf_dir):
    """Domain extraction for domain-level corpus filtering (planted
    URLs, same rationale as pii_redact)."""
    from mmlspark_spark.llm import extract_domains

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("see https://site"), (F.col("doc_id") % 10).cast("string"),
            F.lit(".example.org/p?x=1 and http://cdn.example.net/img "),
            F.col("text"),
        ).alias("text"))
    # joined to a scalar string: no hash-green driver row has ever
    # carried a raw array column, so don't make this query the first
    # to probe the driver's array hashing
    return planted.select(
        "doc_id",
        F.array_join(extract_domains("text"), " ").alias("domains"))


@register(
    "incremental_dedup",
    oracle="""
    SELECT d.doc_id
    FROM documents d
    WHERE NOT EXISTS (
      SELECT 1 FROM documents r
      WHERE r.doc_id % 5 = 0
        AND (r.text = d.text OR (r.text IS NULL AND d.text IS NULL)))
    """,
)
def incremental_dedup_q(spark, sf_dir):
    """Ingestion-time dedup of a batch against an already-ingested
    registry (here: every 5th document plays the registry) via
    llm.IncrementalDeduplicator — bloom negatives pass MAP-ONLY
    without shuffling; only bloom positives take the exact confirm
    join, and the result is byte-identical to the plain anti join the
    oracle states."""
    from mmlspark_spark.llm import IncrementalDeduplicator

    docs = _t(spark, sf_dir, "documents")
    reference = docs.filter(F.col("doc_id") % 5 == 0)
    from mmlspark_spark.core.cache import propagate_intermediates

    dedup = IncrementalDeduplicator(
        referenceDf=reference, keyCols=["text"], mode="drop",
        bloomBits=1 << 17, bloomHashes=5)
    out = dedup.transform(docs)
    # select() would strip the persisted-registry handle (cache leak)
    return propagate_intermediates(out, out.select("doc_id"))


def _exact_match_oracle(dead: str | None = None,
                        cap: int = 1000) -> str:
    """Replays IncrementalDeduplicator.match_against_index: the batch
    is a reproducible construction over documents (every 7th doc
    copied verbatim under a new id — the re-crawled duplicates — plus
    every 11th doc salted with a suffix — the novel rows the bloom
    and the join must both pass through untouched); the stored side
    is docs < 400. Equality on the 128-bit content hash is equality
    on the null-safe key itself (collisions ~2^-96, the operator's
    own documented contract), so the oracle joins on the raw text
    with IS NOT DISTINCT FROM — the same NULL==NULL semantics
    functions/keys.py serializes. ``dead`` (a doc_id predicate)
    replays a pending tombstone set: masked ids leave the stored
    side BEFORE the hot-key cap count. The cap counts STORED members
    per key (match-time semantics), replayed in the ok CTE."""
    stored = f"doc_id < 400" + (f" AND NOT ({dead})" if dead else "")
    return f"""
    WITH batch AS (
      SELECT doc_id + 10000 AS doc_id, text
      FROM documents WHERE doc_id % 7 = 0
      UNION ALL
      SELECT doc_id + 20000 AS doc_id, text || ' qq' AS text
      FROM documents WHERE doc_id % 11 = 0
    ), stored AS (
      SELECT doc_id, text FROM documents WHERE {stored}
    ), touched AS (
      SELECT s.doc_id, s.text FROM stored s
      WHERE EXISTS (SELECT 1 FROM batch b
                    WHERE b.text IS NOT DISTINCT FROM s.text)
    ), ok AS (
      SELECT text FROM touched GROUP BY text HAVING count(*) <= {cap}
    )
    SELECT b.doc_id AS doc_a, s.doc_id AS doc_b
    FROM batch b
    JOIN touched s ON b.text IS NOT DISTINCT FROM s.text
    JOIN ok ON ok.text IS NOT DISTINCT FROM s.text
    """


def _exact_match_frames(spark, sf_dir):
    """(stored, batch) frames shared by the two exact-match lanes —
    the batch construction must stay in lockstep with
    _exact_match_oracle's batch CTE."""
    docs = _t(spark, sf_dir, "documents")
    batch = (docs.filter(F.col("doc_id") % 7 == 0)
             .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") % 11 == 0)
                 .select((F.col("doc_id") + 20000).alias("doc_id"),
                         F.concat(F.col("text"),
                                  F.lit(" qq")).alias("text"))))
    return docs.filter(F.col("doc_id") < 400), batch


@register("exact_match_indexed", oracle=_exact_match_oracle())
def exact_match_indexed(spark, sf_dir):
    """Incremental EXACT-dup screening against a PERSISTED content-
    hash registry (round 13 — the exact family joins the stored-index
    matrix): the stored corpus (docs < 400) was hashed ONCE into the
    prefix-partitioned registry + bloom sidecar
    (IncrementalDeduplicator.save_index); the incoming batch hashes
    only itself, bloom-prunes map-side, prefix-prunes the stored
    directories, and one 128-bit equi-join emits (batch doc, stored
    doc) pairs. The oracle replays the match-time semantics over the
    raw null-safe key (hash equality == key equality at the operator's
    documented collision bound)."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator

    stored, batch = _exact_match_frames(spark, sf_dir)
    # prefixBits sized to the stored corpus (400 docs -> 32 dirs):
    # the 2^prefixBits directory fanout is the artifact-creation
    # constant, and the production guidance (size it so
    # corpus/2^prefixBits is an affordable scan) applies at sf0.01
    # exactly as at 10^12 docs
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(stored, path)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register("exact_match_tombstoned",
          oracle=_exact_match_oracle(dead="doc_id % 5 = 0"))
def exact_match_tombstoned(spark, sf_dir):
    """The DELETE half of the exact registry's lifecycle under the
    driver's hash gate: the stored corpus tombstones every 5th doc
    (metadata-only — and the bloom sidecar deliberately stays stale,
    over-approximating routing while the confirm join applies the
    mask), then the batch screens against the index. Masked ids
    leave the stored side BEFORE the hot-key cap, so matching equals
    a fresh index over the survivors — exactly what the oracle
    replays. save_index clears stale tombstones on overwrite, so the
    query is hermetic across repeated driver runs."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator

    stored, batch = _exact_match_frames(spark, sf_dir)
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_del_{os.path.basename(sf_dir.rstrip('/'))}")
    dd.save_index(stored, path)
    dd.delete_from_index(
        stored.filter(F.col("doc_id") % 5 == 0).select("doc_id"),
        path)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register(
    "exact_match_incremental",
    oracle="""
    WITH d1 AS (
      SELECT min(doc_id) AS doc_id, text FROM documents
      WHERE doc_id < 300 GROUP BY text
    ), d2 AS (
      SELECT min(doc_id) AS doc_id, text FROM documents
      WHERE doc_id >= 300 AND doc_id < 600 GROUP BY text
    ), appended AS (
      SELECT d2.doc_id, d2.text FROM d2
      WHERE NOT EXISTS (SELECT 1 FROM d1
                        WHERE d1.text IS NOT DISTINCT FROM d2.text)
    ), registry AS (
      SELECT doc_id, text FROM d1
      UNION ALL SELECT doc_id, text FROM appended
    ), batch AS (
      SELECT doc_id + 30000 AS doc_id, text FROM documents
      WHERE doc_id % 13 = 0 AND doc_id < 600
      UNION ALL
      SELECT doc_id + 40000 AS doc_id, text || ' zz' AS text
      FROM documents WHERE doc_id % 17 = 0
    )
    SELECT b.doc_id AS doc_a, s.doc_id AS doc_b
    FROM batch b
    JOIN registry s ON b.text IS NOT DISTINCT FROM s.text
    """,
)
def exact_match_incremental(spark, sf_dir):
    """The streaming ingest boundary under the driver's hash gate
    (round 14): two deterministic micro-batches flow through
    ``registry_ingest_foreach_batch`` — day 1 bootstraps the exact
    registry (within-batch copies collapse to the lowest id), day 2
    screens against it with drop semantics and appends only its
    survivors — then a third batch (verbatim re-crawls of both days
    under fresh ids + salted novels) matches against the GROWN
    artifact. The oracle replays registry growth in SQL: day-1
    distinct keys, plus day-2 keys absent from day 1, joined to the
    batch on the raw null-safe key (hash equality == key equality at
    the operator's documented 2^-96 collision bound). The registry
    holds one row per distinct key by construction, so the hot-key
    cap can never trip and needs no replay. The artifact directory is
    removed up front: an ingest topology GROWS an artifact (it never
    overwrites), so hermeticity across driver runs is the lane's job,
    not save_index's."""
    import os

    from mmlspark_spark.llm import IncrementalDeduplicator
    from mmlspark_spark.llm.index_common import _hadoop_fs
    from mmlspark_spark.streaming import registry_ingest_foreach_batch

    docs = _t(spark, sf_dir, "documents")
    day1 = docs.filter(F.col("doc_id") < 300).select("doc_id", "text")
    day2 = (docs.filter((F.col("doc_id") >= 300)
                        & (F.col("doc_id") < 600))
            .select("doc_id", "text"))
    batch = (docs.filter((F.col("doc_id") % 13 == 0)
                         & (F.col("doc_id") < 600))
             .select((F.col("doc_id") + 30000).alias("doc_id"), "text")
             .unionByName(
                 docs.filter(F.col("doc_id") % 17 == 0)
                 .select((F.col("doc_id") + 40000).alias("doc_id"),
                         F.concat(F.col("text"),
                                  F.lit(" zz")).alias("text"))))
    dd = IncrementalDeduplicator(keyCols=("text",), idCol="doc_id",
                                 bloomBits=1 << 17, prefixBits=5)
    path = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"exact_inc_{os.path.basename(sf_dir.rstrip('/'))}")
    fs, P = _hadoop_fs(spark, path)
    fs.delete(P(path), True)
    ingest = registry_ingest_foreach_batch(dd, path)
    ingest(day1, 0)
    ingest(day2, 1)
    return dd.match_against_index(dd.load_index(spark, path), batch)


@register(
    "warc_roundtrip",
    oracle="SELECT doc_id, text FROM documents WHERE text IS NOT NULL",
)
def warc_roundtrip(spark, sf_dir):
    """The crawl-format ingest surface under the driver's hash gate
    (round 14; round 15 re-gates the streaming-member decode +
    resource-record typing): every non-null document is re-published
    as WARC.gz ``resource`` records (``write_warc`` — per-record gzip
    members, one archive per partition, the Common Crawl convention)
    and read back through ``read_warc`` (binaryFile source + Arrow
    mapInPandas record parser, member-at-a-time gzip decode).
    Payloads are length-prefixed raw bytes, so the round trip is
    exact for arbitrary text — the oracle is simply the source
    table. The archive directory is rebuilt per run (a sink
    writes one file per partition; stale files from a wider previous
    partitioning would duplicate rows)."""
    import os
    import shutil

    from mmlspark_spark.sources import read_warc, write_warc

    docs = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull()))
    out = os.path.join(
        "/tmp/mmlspark_spark_idx",
        f"warc_rt_{os.path.basename(sf_dir.rstrip('/'))}")
    shutil.rmtree(out, ignore_errors=True)
    payload = docs.select(
        F.concat(F.lit("doc://"),
                 F.col("doc_id").cast("string")).alias("target_uri"),
        F.encode("text", "UTF-8").alias("payload"))
    write_warc(payload.repartition(4), out)
    back = read_warc(spark, out)
    return back.select(
        F.substring("target_uri", 7, 2147483647).cast("long")
        .alias("doc_id"),
        F.decode("payload", "UTF-8").alias("text"))


@register(
    "heavy_hitters",
    oracle=r"""
    SELECT value, cnt FROM (
      SELECT t AS value, count(*) AS cnt
      FROM (SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                      x -> x <> '')) AS t
            FROM documents)
      GROUP BY t)
    ORDER BY cnt DESC, value LIMIT 50
    """,
)
def heavy_hitters_q(spark, sf_dir):
    """Exact top-50 most frequent tokens of the corpus via
    operators.HeavyHitters — the hot-key detector that feeds shingle
    caps and skew-salting factors. Partial-aggregated groupBy over
    |distinct tokens| + TakeOrderedAndProject (no global sort); ties
    broken by token so the LIMIT boundary is deterministic."""
    from mmlspark_spark.operators import HeavyHitters

    docs = _t(spark, sf_dir, "documents")
    return HeavyHitters(inputCol="text", k=50, tokenize=True).transform(docs)


@register(
    "line_dedup",
    oracle="""
    WITH docs2 AS (
      SELECT doc_id,
             'subscribe to our newsletter' || chr(10) || text || chr(10)
               || 'topic ' || (doc_id % 40) AS text
      FROM documents),
    ex AS (
      SELECT doc_id,
             unnest(string_split(text, chr(10))) AS line,
             generate_subscripts(string_split(text, chr(10)), 1) AS pos
      FROM docs2),
    hot AS (
      SELECT line FROM (
        SELECT line, count(DISTINCT doc_id) AS df FROM ex GROUP BY line)
      WHERE df > 20)
    SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
    FROM ex WHERE line NOT IN (SELECT line FROM hot)
    GROUP BY doc_id
    """,
)
def line_dedup_q(spark, sf_dir):
    """CCNet-style boilerplate-line removal via llm.LineDeduplicator
    (planted: a footer in every doc — removed everywhere — and a
    'topic N' line shared by ~12 docs — under the threshold, kept).
    Lines shuffle as fixed-width hash lanes; the hot-line set
    broadcasts into a map-side anti join; docs reassemble in original
    line order."""
    from mmlspark_spark.llm import LineDeduplicator

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit("subscribe to our newsletter\n"), F.col("text"),
                 F.lit("\ntopic "),
                 (F.col("doc_id") % 40).cast("string")).alias("text"))
    return LineDeduplicator(maxDocFrequency=20).transform(docs)


@register(
    "markup_strip",
    oracle=r"""
    SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(
             regexp_replace(regexp_replace(
               '<html><head><style>p { color: #' || (doc_id % 10)
                 || '; }</style><script type="text/javascript">var x = '
                 || doc_id || ';</script></head><body><!-- id '
                 || doc_id || ' --><p class="a">' || text
                 || '</p>&nbsp;&amp;&lt;tag&gt; &quot;q&#39;</body></html>',
               '(?s)<script\b[^>]*>.*?</script>', ' ', 'g'),
               '(?s)<style\b[^>]*>.*?</style>', ' ', 'g'),
               '(?s)<!--.*?-->', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               '&nbsp;', ' ', 'g'),
               '&lt;', '<', 'g'),
               '&gt;', '>', 'g'),
               '&quot;', '"', 'g'),
               '&#39;|&apos;', '''', 'g'),
               '&amp;', '&', 'g'),
               '\s+', ' ', 'g')) AS clean
    FROM documents
    """,
)
def markup_strip_q(spark, sf_dir):
    """Web-corpus markup stripping via llm.MarkupStripper (planted
    HTML shell around each document: script + style bodies, comments,
    tags, the common entities). Pure regexp chain, map-only — the
    oracle replays the identical RE2-subset patterns with DuckDB's
    'g' flag."""
    from mmlspark_spark.llm import MarkupStripper

    docs = _t(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.lit("<html><head><style>p { color: #"),
            (F.col("doc_id") % 10).cast("string"),
            F.lit('; }</style><script type="text/javascript">var x = '),
            F.col("doc_id").cast("string"),
            F.lit(";</script></head><body><!-- id "),
            F.col("doc_id").cast("string"),
            F.lit(' --><p class="a">'), F.col("text"),
            F.lit("</p>&nbsp;&amp;&lt;tag&gt; &quot;q&#39;</body></html>"),
        ).alias("text"))
    return (MarkupStripper(textCol="text", outputCol="clean")
            .transform(planted).select("doc_id", "clean"))


@register(
    "perplexity_prune",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), uc AS (
      SELECT w, count(*) AS uc
      FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
    ), v AS (SELECT count(*) AS v FROM uc),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1])) AS b
      FROM toks
    ), bc AS (SELECT b, count(*) AS bc FROM bg GROUP BY b),
    scored AS (
      SELECT g.doc_id,
             round(avg(ln((coalesce(bc.bc, 0) + 0.5)
                          / (coalesce(uc.uc, 0)
                             + 0.5 * (SELECT v FROM v)))), 6)
               AS avg_logprob
      FROM bg g LEFT JOIN bc ON g.b = bc.b LEFT JOIN uc ON g.w1 = uc.w
      GROUP BY g.doc_id
    ), thr AS (
      SELECT quantile_cont(avg_logprob, 0.75) AS thr FROM scored)
    SELECT doc_id, avg_logprob
    FROM scored WHERE avg_logprob >= (SELECT thr FROM thr)
    """)
def perplexity_prune(spark, sf_dir):
    """CCNet perplexity pruning as one pipeline: bigram-LM score every
    document (NGramLanguageModel, exact integer counts -> engine-
    portable probabilities), keep the most-fluent quartile. The
    quartile THRESHOLD comes from one exact-percentile aggregate
    broadcast back as a one-row frame — NOT from a global ntile sort,
    which would single-partition 100 TB; both engines use the same
    (n-1)p linear interpolation, and scores are 6dp-rounded before the
    compare so the boundary cannot flip. Docs with no bigrams score
    NULL and fall out on both sides."""
    from mmlspark_spark.core.cache import (
        attach_intermediates,
        persist_intermediate,
        propagate_intermediates,
    )
    from mmlspark_spark.llm import NGramLanguageModel

    docs = _t(spark, sf_dir, "documents")
    model = NGramLanguageModel(textCol="text", k=0.5, lowercase=True).fit(docs)
    model.set("idCol", "doc_id")
    raw = model.transform(docs)  # carries the persisted count frames
    # scored feeds BOTH the percentile aggregate and the filter —
    # persist it or the whole LM scoring dataflow runs twice
    scored = persist_intermediate(raw.select(
        "doc_id", F.round("avg_logprob", 6).alias("avg_logprob")))
    thr = scored.agg(
        F.percentile("avg_logprob", F.lit(0.75)).alias("__thr"))
    out = (scored.crossJoin(F.broadcast(thr))
           .filter(F.col("avg_logprob") >= F.col("__thr"))
           .select("doc_id", "avg_logprob"))
    out = propagate_intermediates(raw, out)
    return attach_intermediates(out, scored)


@register("bpe_tokenize", oracle=None)
def bpe_tokenize_q(spark, sf_dir):
    """Learned-subword tokenization (llm.BPETokenizer): fit a BPE
    merge table from the corpus word histogram (one vocabulary-sized
    shuffle; merge learning is driver-side over the histogram,
    corpus-size-independent), then tokenize map-only with per-word
    memoization. Rows-only: the merge loop is iterative and
    data-dependent, not SQL-expressible — semantics are pinned by
    hand-computed merge tests (tests/test_curation.py)."""
    from mmlspark_spark.llm import BPETokenizer

    docs = _t(spark, sf_dir, "documents")
    model = BPETokenizer(textCol="text", numMerges=200,
                         lowercase=True).fit(docs)
    return (model.transform(docs)
            .select("doc_id", F.size("bpe_tokens").alias("n_bpe_tokens")))


@register(
    "scd2_merge",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           TRUE AS is_current, CAST(NULL AS VARCHAR) AS batch_id
    FROM customer WHERE c_custkey % 7 <> 0
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
           FALSE, NULL
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey, c_name, c_nationkey, round(c_acctbal + 100, 4),
           c_mktsegment, TRUE, 'B1'
    FROM customer WHERE c_custkey % 7 = 0
    UNION ALL
    SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
           c_mktsegment, TRUE, 'B1'
    FROM customer WHERE c_custkey % 100 = 0
    """)
def scd2_merge_q(spark, sf_dir):
    """MERGE INTO / SCD Type-2 apply (operators.SCD2Merge): a change
    batch (every 7th customer's balance moves; every 100th customer
    re-arrives under a new key) merges into the dimension — old
    versions retire to history, new versions and inserts stamp the
    batch id. The oracle derives the expected classification
    INDEPENDENTLY (set algebra over the planted batch), so it checks
    the merge semantics, not the operator's own join."""
    from mmlspark_spark.operators import SCD2Merge

    cust = _t(spark, sf_dir, "customer")
    updates = (cust.filter(F.col("c_custkey") % 7 == 0)
               .withColumn("c_acctbal",
                           F.round(F.col("c_acctbal") + 100, 4)))
    inserts = (cust.filter(F.col("c_custkey") % 100 == 0)
               .withColumn("c_custkey", F.col("c_custkey") + 1000000))
    merge = SCD2Merge(changesDf=updates.unionByName(inserts),
                      keyCols=["c_custkey"], batchId="B1")
    return merge.transform(cust)


@register(
    "funnel_steps",
    oracle="""
    WITH t1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    t2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM events e JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id),
    t3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM events e JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT 'step1_view' AS step, count(*) AS users FROM t1
    UNION ALL SELECT 'step2_click', count(*) FROM t2
    UNION ALL SELECT 'step3_purchase', count(*) FROM t3
    """)
def funnel_steps_q(spark, sf_dir):
    """Ordered-funnel analysis (view -> click -> purchase, each step
    strictly after the user's first arrival at the previous step) —
    the product-analytics staple. Each step is a conditional min
    aggregate; the per-step user frames are user-cardinality small
    and broadcast into the next step's filter, so events scans stay
    map-filtered and only aggregate shuffles move data."""
    ev = _t(spark, sf_dir, "events")
    t1 = (ev.filter(F.col("event_type") == "view")
          .groupBy("user_id").agg(F.min("ts").alias("__t1")))
    t2 = (ev.filter(F.col("event_type") == "click")
          .join(F.broadcast(t1.withColumnRenamed("user_id", "__u1")),
                (F.col("user_id") == F.col("__u1"))
                & (F.col("ts") > F.col("__t1")))
          .groupBy("user_id").agg(F.min("ts").alias("__t2")))
    t3 = (ev.filter(F.col("event_type") == "purchase")
          .join(F.broadcast(t2.withColumnRenamed("user_id", "__u2")),
                (F.col("user_id") == F.col("__u2"))
                & (F.col("ts") > F.col("__t2")))
          .groupBy("user_id").agg(F.min("ts").alias("__t3")))
    def step(df, name):
        return df.agg(F.lit(name).alias("step"),
                      F.count("*").alias("users"))
    return (step(t1, "step1_view")
            .unionByName(step(t2, "step2_click"))
            .unionByName(step(t3, "step3_purchase")))


@register(
    "group_percentiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type ORDER BY event_type
    """)
def group_percentiles_q(spark, sf_dir):
    """Exact per-group percentiles (latency/value SLO reporting):
    one ObjectHashAggregate pass computes all three quantiles per
    group — Spark's percentile and DuckDB's quantile_cont share the
    (n-1)p linear-interpolation definition, so the values compare
    hash-exact at 6dp. At 100 TB swap in approx_percentile (t-digest)
    — same plan shape, bounded state; the exact form is the oracled
    contract."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
                 F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
                 F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"))
            .orderBy("event_type"))


@register(
    "rolling_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate
             RANGE BETWEEN INTERVAL 90 DAY PRECEDING AND CURRENT ROW),
             4) AS rolling_90d
    FROM lineitem WHERE l_suppkey < 10
    """)
def rolling_revenue_q(spark, sf_dir):
    """Time-RANGE window frame (90-day trailing revenue per supplier)
    — the rangeBetween face of SURVEY §2.5 (row-frame windows are
    covered by sessionize/top_k). Spark's rangeBetween needs a numeric
    ordering key, so the frame runs over unix_micros(shipdate) with a
    90-day micros radius — peer rows (equal timestamps) enter the
    frame together in both engines, which is what makes RANGE (not
    ROWS) the deterministic choice under ties. Parquet timestamps load
    as TIMESTAMP_NTZ (Spark 4), which unix_micros rejects - the cast
    to TIMESTAMP is exact under the session UTC timezone. One shuffle
    on the partition key; frame state is a running sum, never the
    partition."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") < 10)
    w = (Window.partitionBy("l_suppkey")
         .orderBy(F.unix_micros(F.col("l_shipdate").cast("timestamp")))
         .rangeBetween(-90 * 86400 * 1_000_000, 0))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 4).alias("rolling_90d"))


@register(
    "pagerank",
    oracle="""
    WITH e AS (
      SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
    r0 AS (SELECT node, 1.0 AS rank FROM n),
    r1 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r0.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r0 ON r0.node = e.src
      GROUP BY n.node),
    r2 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r1.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r1 ON r1.node = e.src
      GROUP BY n.node),
    r3 AS (
      SELECT n.node, 0.15 + 0.85 * coalesce(sum(r2.rank / deg.d), 0) AS rank
      FROM n LEFT JOIN e ON e.dst = n.node
      LEFT JOIN deg ON e.src = deg.src
      LEFT JOIN r2 ON r2.node = e.src
      GROUP BY n.node)
    SELECT node, round(rank, 6) AS rank FROM r3
    """)
def pagerank_q(spark, sf_dir):
    """Fixed-iteration PageRank over the customer->supplier purchase
    graph (operators.pagerank — the iterative-dataflow pattern: one
    src join + one dst aggregate per iteration, persisted edge/degree
    frames, lineage cut by checkpoint interval). Node ids are
    type-prefixed ('c'/'s') because customer and supplier keys share
    the integer space. The oracle unrolls the three iterations as
    chained CTEs — probabilities verify hash-exact at 6dp."""
    from mmlspark_spark.operators import pagerank as _pr

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    edges = (orders.join(li, orders.o_orderkey == li.l_orderkey)
             .select(F.concat(F.lit("c"),
                              F.col("o_custkey").cast("string")).alias("src"),
                     F.concat(F.lit("s"),
                              F.col("l_suppkey").cast("string")).alias("dst")))
    ranks = _pr(edges, iterations=3, damping=0.85)
    from mmlspark_spark.core.cache import propagate_intermediates

    out = ranks.select("node", F.round("rank", 6).alias("rank"))
    return propagate_intermediates(ranks, out)


@register(
    "corpus_report",
    oracle="""
    SELECT CASE WHEN grouping(lang) = 1 THEN '<all>'
                ELSE coalesce(lang, '<null>') END AS lang,
           CASE WHEN grouping(source) = 1 THEN '<all>'
                ELSE coalesce(source, '<null>') END AS source,
           count(*) AS docs,
           CAST(sum(len(list_filter(string_split_regex(text, '[ \\t\\n\\r]+'),
                               x -> x <> ''))) AS BIGINT) AS tokens,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY GROUPING SETS ((lang, source), (lang), (source), ())
    """)
def corpus_report_q(spark, sf_dir):
    """Corpus composition report — the first artifact a curation run
    produces: doc/token/char totals at every roll-up level in ONE
    aggregation pass via GROUPING SETS (the generalized face of the
    cube/rollup queries; Spark expands the sets map-side, so the
    corpus scans once, not once per level). Roll-up cells are labelled
    via grouping() — coalesce alone could not distinguish the <all>
    cell from a document whose lang/source is genuinely NULL."""
    docs = _t(spark, sf_dir, "documents")
    # Explicit ASCII whitespace class: Java-regex \s and DuckDB-RE2 \s
    # disagree on \x0B and Unicode spaces, so both sides pin the class
    # (single source: functions/text_quality.PINNED_WS_RE).
    from mmlspark_spark.functions.text_quality import PINNED_WS_RE

    tok = F.size(F.filter(F.split("text", PINNED_WS_RE),
                          lambda x: x != F.lit("")))
    return (docs
            .groupingSets([["lang", "source"], ["lang"], ["source"], []],
                          "lang", "source")
            .agg(F.count("*").alias("docs"),
                 F.sum(tok).alias("tokens"),
                 F.round(F.avg("n_chars"), 4).alias("avg_chars"),
                 # grouping() only resolves inside the aggregate
                 F.grouping("lang").alias("__gl"),
                 F.grouping("source").alias("__gs"))
            .select(
                F.when(F.col("__gl") == 1, "<all>")
                .otherwise(F.coalesce("lang", F.lit("<null>")))
                .alias("lang"),
                F.when(F.col("__gs") == 1, "<all>")
                .otherwise(F.coalesce("source", F.lit("<null>")))
                .alias("source"),
                "docs", "tokens", "avg_chars"))
