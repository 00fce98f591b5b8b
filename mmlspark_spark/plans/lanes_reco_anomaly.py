"""Recommendation (SAR) and cyber/anomaly lanes (SURVEY §2.4, §2.10)

Split from the former single-file ``plans/catalog.py`` (round 15,
purely mechanical — no lane changed; the ``CATALOG`` registry in
``plans.catalog`` is the only contract and import order preserves the
original registration order)."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401
from pyspark.sql import DataFrame  # noqa: F401
from pyspark.sql.window import Window  # noqa: F401

from mmlspark_spark.plans.catalog import _t, register  # noqa: F401

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
    from mmlspark_spark.core.cache import propagate_intermediates

    return propagate_intermediates(
        sim, sim.select("item_i", "item_j", "cooccur",
                        F.round("similarity", 6).alias("similarity")))


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
    from mmlspark_spark.core.cache import propagate_intermediates

    return propagate_intermediates(recs, (
        recs.select("user_id", "item_id", F.round("score", 6).alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    ))


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
