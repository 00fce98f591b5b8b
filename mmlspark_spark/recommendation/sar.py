"""SAR — Smart Adaptive Recommendations, PySpark-native.

Parity: reference ``core/.../recommendation/SAR.scala:66-209`` and
``SARModel.scala:99-135``. Semantics preserved:

- **User-item affinity** (``SAR.scala:86-121``): per (user, item),
  ``sum(rating * 2^(-(t_ref - t)/ (timeDecayCoeff days)))`` — rating
  and/or time optional, falling back to 1.

- **Item-item similarity** (``SAR.scala:152-209``): co-occurrence =
  number of distinct users who interacted with both items; normalized
  by ``jaccard`` (default), ``lift``, or raw ``cooccurrence``; pairs
  below ``supportThreshold`` dropped.

Scale re-design (NOT a port): the reference **collects** the whole
user-item matrix to the driver and broadcasts a breeze sparse matrix
(``SAR.scala:155-174``) — impossible at 100 TB. Here the same math is a
distributed self-join on the distinct (user, item) edge list::

    cooccur(i, j) = |users(i) ∩ users(j)|  =  edges ⋈_user edges, groupBy (i, j)

which shuffles on user (skew: cap with supportThreshold filter + AQE
skew-join) and never materializes anything on the driver. Scoring
(``SARModel.scala:113-125``, a BlockMatrix multiply + per-row sort UDF)
becomes affinity ⋈ similarity on item + groupBy(user, candidate) +
window top-k — the same sparse matrix product expressed relationally,
so Catalyst picks the physical strategy at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from mmlspark_spark.core.base import Estimator, Model

SIMILARITY_FUNCTIONS = ("jaccard", "lift", "cooccurrence")


def user_item_affinity(
    df: DataFrame,
    userCol: str,
    itemCol: str,
    timeCol: str | None = None,
    ratingCol: str | None = None,
    timeDecayCoeff: float = 30.0,
    startTime: str | None = None,
    affinityCol: str = "affinity",
) -> DataFrame:
    """Time-decayed affinity; one row per (user, item).

    Decay is ``2^(-minutes_since / (timeDecayCoeff * 24 * 60))`` exactly
    as the reference UDF (``SAR.scala:90-96``) but as a column
    expression so it stays in whole-stage codegen.
    """
    if timeCol is not None:
        if startTime is None:
            raise ValueError("startTime (reference timestamp) required with timeCol")
        # parquet timestamps arrive as TIMESTAMP_NTZ in Spark 4; go through
        # timestamp_ltz (identity under the UTC session TZ) to epoch seconds
        def _epoch(c):
            return F.unix_micros(c.cast("timestamp_ltz")).cast("double") / 1e6

        minutes = (
            _epoch(F.lit(startTime).cast("timestamp")) - _epoch(F.col(timeCol))
        ) / 60.0
        decay = F.pow(F.lit(2.0), -minutes / (timeDecayCoeff * 24 * 60))
        aff = decay * F.col(ratingCol) if ratingCol else decay
    else:
        aff = F.col(ratingCol) if ratingCol else F.lit(1.0)
    return (
        df.select(userCol, itemCol, aff.cast("double").alias(affinityCol))
        .groupBy(userCol, itemCol)
        .agg(F.sum(affinityCol).alias(affinityCol))
    )


def item_item_similarity(
    df: DataFrame,
    userCol: str,
    itemCol: str,
    similarityFunction: str = "jaccard",
    supportThreshold: int = 4,
    similarityCol: str = "similarity",
    maxItemsPerUser: int | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Distributed co-occurrence similarity; columns (item_i, item_j,
    cooccur, similarity). Includes the diagonal (i == j), like the
    reference's matrix product.

    ``maxItemsPerUser`` is the 100 TB guard (same pattern as
    ``llm.dedup.ngram_jaccard_pairs``'s ``maxDocsPerShingle``): the
    pair expansion is O(L²) *inside one row's array* for a user with L
    items, and AQE cannot split a single row — a crawler account with
    10⁵ items would materialize ~10¹⁰ pair structs in one task. With
    the cap, users above the threshold are dropped before expansion
    (their diagonal occurrence counts drop with them, so jaccard/lift
    stay honest ratios over the users actually compared; power-user
    histories carry little preference signal — capping them is standard
    SAR practice). The number of dropped users is the observed metric
    ``sar_hot_user_drops``. Default None = exact semantics over every
    user (matches the SQL oracle). At scale, set e.g. 1000.
    """
    if similarityFunction not in SIMILARITY_FUNCTIONS:
        raise ValueError(f"similarityFunction must be one of {SIMILARITY_FUNCTIONS}")
    edges = df.select(
        F.col(userCol).alias("__u"), F.col(itemCol).alias("__i")
    ).distinct()
    # Pair generation via ONE groupBy(user) + array expressions instead
    # of a self-join on user: the naive join plans 3 full scans of the
    # edge list (both join sides + the occ aggregate) with no exchange
    # reuse. Here: distinct → per-user sorted item list → upper-triangle
    # pairs (incl. diagonal) exploded → pair count; the lower triangle
    # is mirrored afterwards (cooccurrence is symmetric), and
    # occ(i) = countDistinct(users of i) = cooccur(i, i) falls out of
    # the diagonal for free. 3 shuffles, 1 scan, at any scale.
    per_user = edges.groupBy("__u").agg(
        F.array_sort(F.collect_set("__i")).alias("__items"))
    if maxItemsPerUser is not None:
        per_user = per_user.observe(
            "sar_hot_user_drops",
            F.sum(F.when(F.size("__items") > maxItemsPerUser, 1)
                  .otherwise(0)).alias("dropped_users"),
        ).filter(F.size("__items") <= maxItemsPerUser)
    items = F.col("__items")
    upper = F.flatten(F.transform(
        items,
        lambda x, i: F.transform(
            F.slice(items, i + 1, F.size(items)),  # from self → diagonal kept
            lambda y: F.struct(x.alias("i"), y.alias("j")),
        ),
    ))
    co_upper = (
        per_user.select(F.explode(upper).alias("__p"))
        .groupBy(F.col("__p.i").alias("item_i"), F.col("__p.j").alias("item_j"))
        .agg(F.count("*").alias("cooccur"))
    )
    cached = []
    if materialize:
        # co_upper fans out to THREE consumers (the occ diagonal — built
        # twice, once per broadcast side — and both union branches of
        # co_full); AQE's exchange reuse misses the multi-consumer
        # subtree, so without the persist the whole scan → distinct →
        # collect_set → pair-explode → groupBy pipeline executes 4×.
        # The persisted frame is (item, item, long) — tiny next to the
        # edge list — and the handle is attached to the returned
        # DataFrame for release_intermediates (same lifecycle contract
        # as ngram_jaccard_pairs).
        from mmlspark_spark.core.cache import persist_intermediate

        co_upper = persist_intermediate(co_upper)
        cached.append(co_upper)
    occ = co_upper.filter(F.col("item_i") == F.col("item_j")).select(
        F.col("item_i").alias("__i"), F.col("cooccur").alias("__occ"))
    co_full = co_upper.unionByName(
        co_upper.filter(F.col("item_i") != F.col("item_j")).select(
            F.col("item_j").alias("item_i"), F.col("item_i").alias("item_j"),
            "cooccur"))
    co = (
        co_full.filter(F.col("cooccur") >= supportThreshold)
        .join(F.broadcast(occ.withColumnRenamed("__i", "item_i")
                          .withColumnRenamed("__occ", "occ_i")), "item_i")
        .join(F.broadcast(occ.withColumnRenamed("__i", "item_j")
                          .withColumnRenamed("__occ", "occ_j")), "item_j")
    )
    c = F.col("cooccur").cast("double")
    if similarityFunction == "jaccard":
        sim = c / (F.col("occ_i") + F.col("occ_j") - c)
    elif similarityFunction == "lift":
        sim = c / (F.col("occ_i") * F.col("occ_j"))
    else:
        sim = c
    out = co.select("item_i", "item_j", "cooccur", sim.alias(similarityCol))
    if cached:
        from mmlspark_spark.core.cache import attach_intermediates

        out = attach_intermediates(out, *cached)
    return out


class SAR(Estimator):
    """fit(interactions) -> SARModel with lazy affinity + similarity
    DataFrames (no driver materialization)."""

    def __init__(
        self,
        userCol: str = "user",
        itemCol: str = "item",
        timeCol: str | None = None,
        ratingCol: str | None = None,
        timeDecayCoeff: float = 30.0,
        startTime: str | None = None,
        similarityFunction: str = "jaccard",
        supportThreshold: int = 4,
        maxItemsPerUser: int | None = None,
    ):
        super().__init__(
            userCol=userCol, itemCol=itemCol, timeCol=timeCol,
            ratingCol=ratingCol, timeDecayCoeff=timeDecayCoeff,
            startTime=startTime, similarityFunction=similarityFunction,
            supportThreshold=supportThreshold,
            maxItemsPerUser=maxItemsPerUser,
        )

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        cols = [self.userCol, self.itemCol]
        if self.timeCol:
            cols.append(self.timeCol)
        if self.ratingCol:
            cols.append(self.ratingCol)
        self._require_cols(schema, *cols)
        return schema

    def _fit(self, df: DataFrame) -> "SARModel":
        user_df = user_item_affinity(
            df, self.userCol, self.itemCol, self.timeCol, self.ratingCol,
            self.timeDecayCoeff, self.startTime,
        )
        item_df = item_item_similarity(
            df, self.userCol, self.itemCol,
            self.similarityFunction, self.supportThreshold,
            maxItemsPerUser=self.maxItemsPerUser,
        )
        return SARModel(
            userDataFrame=user_df, itemDataFrame=item_df,
            userCol=self.userCol, itemCol=self.itemCol,
        )


class SARModel(Model):
    """Holds (user, item, affinity) and (item_i, item_j, similarity)."""

    def __init__(self, userDataFrame=None, itemDataFrame=None,
                 userCol: str = "user", itemCol: str = "item"):
        super().__init__(
            userDataFrame=userDataFrame, itemDataFrame=itemDataFrame,
            userCol=userCol, itemCol=itemCol,
        )

    def recommend_for_all_users(self, k: int, remove_seen: bool = True) -> DataFrame:
        """score(u, j) = Σ_i affinity(u, i) · sim(i, j); top-k per user.

        The reference computes this as a distributed BlockMatrix multiply
        then sorts each row in a UDF (``SARModel.scala:113-125``); the
        relational form below is the identical sparse product with the
        top-k as a window — partial aggregation and AQE keep the shuffle
        proportional to non-zero scores.
        """
        aff = self.userDataFrame
        sim = self.itemDataFrame
        cached = []
        if remove_seen:
            # aff then has TWO consumers (the score join and the
            # seen-items anti join) and its subtree is a full
            # interactions aggregate — persist it so it computes once
            # (released through the returned frame's attached handles)
            from mmlspark_spark.core.cache import persist_intermediate

            aff = persist_intermediate(aff)
            cached.append(aff)
        scores = (
            aff.join(sim, aff[self.itemCol] == sim["item_i"])
            .groupBy(F.col(self.userCol), F.col("item_j").alias(self.itemCol))
            .agg(F.sum(F.col("affinity") * F.col("similarity")).alias("score"))
        )
        if remove_seen:
            scores = scores.join(
                aff.select(self.userCol, self.itemCol),
                on=[self.userCol, self.itemCol], how="left_anti",
            )
        w = Window.partitionBy(self.userCol).orderBy(
            F.col("score").desc(), F.col(self.itemCol).asc()
        )
        out = (
            scores.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
        # itemDataFrame may carry a persisted co-occurrence intermediate
        # (item_item_similarity materialize=True); hand that handle and
        # the affinity persist to whoever consumes the recommendations
        from mmlspark_spark.core.cache import (
            attach_intermediates,
            propagate_intermediates,
        )

        return attach_intermediates(
            propagate_intermediates(sim, out), *cached)

    def transform_schema(self, schema: T.StructType) -> T.StructType:
        self._require_cols(schema, self.userCol)
        # the item field keeps the FITTED item type (string ids are the
        # common case) — a hardcoded LongType made the eager-schema
        # contract wrong for any non-long item column
        item_type = self.itemDataFrame.schema["item_i"].dataType
        return T.StructType(
            list(schema.fields)
            + [T.StructField("recommendations",
                             T.ArrayType(T.StructType([
                                 T.StructField(self.itemCol, item_type),
                                 T.StructField("score", T.DoubleType()),
                             ])))]
        )

    def _transform(self, df: DataFrame) -> DataFrame:
        """Attach top-10 recommendations to each user row, best first.

        collect_list gives NO ordering guarantee after a shuffle, so the
        rank rides inside the collected struct and sort_array restores
        it before the rank field is projected away — recommendations[0]
        must always be the top item."""
        ranked = self.recommend_for_all_users(10)
        recs = (
            ranked.groupBy(self.userCol)
            .agg(F.sort_array(
                F.collect_list(F.struct("rank", self.itemCol, "score")))
                .alias("__r"))
            .select(
                self.userCol,
                F.transform(
                    "__r", lambda r: F.struct(
                        r[self.itemCol].alias(self.itemCol),
                        r["score"].alias("score")))
                .alias("recommendations")))
        from mmlspark_spark.core.cache import propagate_intermediates

        return propagate_intermediates(
            ranked, df.join(recs, self.userCol, "left"))
