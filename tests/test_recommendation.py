"""SAR + RecommendationIndexer (reference recommendation/SARSpec.scala
test strategy: known tiny interaction matrix with hand-checked
co-occurrence / Jaccard values)."""

import math

import pytest
from pyspark.sql import functions as F

from mmlspark_spark.recommendation import SAR, RecommendationIndexer
from mmlspark_spark.recommendation.sar import (
    item_item_similarity,
    user_item_affinity,
)


@pytest.fixture(scope="module")
def interactions(spark):
    # users × items: u1:{a,b}, u2:{a,b}, u3:{a,c}, u4:{a}
    rows = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"), ("u2", "b"),  # dup interaction
        ("u3", "a"), ("u3", "c"),
        ("u4", "a"),
    ]
    return spark.createDataFrame(rows, ["user", "item"])


def test_cooccurrence_and_jaccard(interactions):
    sim = item_item_similarity(
        interactions, "user", "item",
        similarityFunction="jaccard", supportThreshold=1,
    )
    got = {(r.item_i, r.item_j): r for r in sim.collect()}
    # occ: a=4, b=2, c=1; cooccur(a,b)=2 (distinct users)
    assert got[("a", "b")].cooccur == 2
    assert abs(got[("a", "b")].similarity - 2 / (4 + 2 - 2)) < 1e-12
    assert got[("a", "a")].cooccur == 4  # diagonal
    assert abs(got[("a", "c")].similarity - 1 / (4 + 1 - 1)) < 1e-12
    # symmetric
    assert got[("b", "a")].cooccur == got[("a", "b")].cooccur


def test_item_similarity_materialize_parity(interactions):
    """materialize=True (persist the co_upper fan-out — r16
    optimization: the subtree otherwise executes once per consumer)
    must be row-identical to the unmaterialized plan, and must attach
    a releasable intermediate handle."""
    from mmlspark_spark.core.cache import release_intermediates

    kwargs = dict(similarityFunction="jaccard", supportThreshold=1)
    plain = item_item_similarity(interactions, "user", "item",
                                 materialize=False, **kwargs)
    mat = item_item_similarity(interactions, "user", "item",
                               materialize=True, **kwargs)
    handles = getattr(mat, "_mmlspark_intermediates", [])
    assert len(handles) == 1  # the persisted co_upper

    def rows(df):
        return sorted((r.item_i, r.item_j, r.cooccur,
                       round(r.similarity, 12)) for r in df.collect())

    try:
        assert rows(mat) == rows(plain)
    finally:
        release_intermediates(mat)
    assert not handles[0].is_cached


def test_lift_and_threshold(interactions):
    sim = item_item_similarity(
        interactions, "user", "item",
        similarityFunction="lift", supportThreshold=2,
    )
    got = {(r.item_i, r.item_j): r.similarity for r in sim.collect()}
    assert ("a", "c") not in got  # below support threshold
    assert abs(got[("a", "b")] - 2 / (4 * 2)) < 1e-12


def test_affinity_counts_when_no_time_no_rating(interactions):
    aff = user_item_affinity(interactions, "user", "item")
    got = {(r.user, r.item): r.affinity for r in aff.collect()}
    assert got[("u2", "b")] == 2.0  # duplicate interaction sums
    assert got[("u1", "a")] == 1.0


def test_affinity_time_decay(spark):
    df = spark.createDataFrame(
        [("u", "i", "2020-01-01 00:00:00", 2.0),
         ("u", "i", "2020-01-31 00:00:00", 2.0)],
        ["user", "item", "t", "r"],
    ).withColumn("t", F.col("t").cast("timestamp"))
    aff = user_item_affinity(
        df, "user", "item", timeCol="t", ratingCol="r",
        timeDecayCoeff=30.0, startTime="2020-01-31 00:00:00",
    )
    val = aff.collect()[0].affinity
    # newest event: decay 1; 30-days-old event: decay 1/2 → 2*1 + 2*0.5
    assert abs(val - (2.0 + 1.0)) < 1e-9


def test_sar_end_to_end_recommend(interactions):
    model = SAR(userCol="user", itemCol="item", supportThreshold=1).fit(interactions)
    recs = model.recommend_for_all_users(2, remove_seen=True)
    got = {(r.user, r.item): r for r in recs.collect()}
    # u4 has only {a}; b and c are unseen, score(u4,b)=aff(a)*sim(a,b)
    assert ("u4", "b") in got and ("u4", "c") in got
    sim_ab = 2 / (4 + 2 - 2)
    assert abs(got[("u4", "b")].score - sim_ab) < 1e-12
    # ranked: b (jaccard 0.5) above c (0.25)
    assert got[("u4", "b")].rank == 1
    # seen items removed
    assert ("u1", "a") not in got


def test_max_items_per_user_cap(spark, interactions):
    """A planted hot user (10^4 items) is dropped by maxItemsPerUser
    before the O(L^2) pair expansion; the capped result over the full
    data equals the uncapped result with the hot user removed, and the
    drop is visible as the sar_hot_user_drops observed metric."""
    hot = spark.range(10_000).select(
        F.lit("crawler").alias("user"),
        F.concat(F.lit("itm"), F.col("id")).alias("item"))
    planted = interactions.unionByName(hot)
    capped = item_item_similarity(
        planted, "user", "item", similarityFunction="jaccard",
        supportThreshold=1, maxItemsPerUser=100)
    baseline = item_item_similarity(
        interactions, "user", "item", similarityFunction="jaccard",
        supportThreshold=1)
    got = {(r.item_i, r.item_j): (r.cooccur, round(r.similarity, 12))
           for r in capped.collect()}
    want = {(r.item_i, r.item_j): (r.cooccur, round(r.similarity, 12))
            for r in baseline.collect()}
    assert got == want
    # the drop is observable (CollectMetrics node carries the count)
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "sar_hot_user_drops" in plan


def test_recommendation_indexer_roundtrip(interactions):
    idx = RecommendationIndexer(
        userInputCol="user", userOutputCol="uidx",
        itemInputCol="item", itemOutputCol="iidx",
    ).fit(interactions)
    out = idx.transform(interactions)
    assert set(out.columns) == {"user", "item", "uidx", "iidx"}
    assert out.select("uidx").distinct().count() == 4
    back = idx.recover_item(out.drop("item"))
    assert back.filter(F.col("item").isNull()).count() == 0
    # deterministic alphabetical indexing
    m = {r.item: r.iidx for r in out.select("item", "iidx").distinct().collect()}
    assert m["a"] == 0.0 and m["b"] == 1.0 and m["c"] == 2.0
