"""RankingEvaluator — map, ndcg@k, precision@k, recall@k (plus the
full AdvancedRankingMetrics set: diversity@k, maxDiversity, mrr, fcp
via :meth:`RankingEvaluator.evaluate_all`) over (prediction-list,
label-list) pairs.

Parity: reference ``core/.../recommendation/RankingEvaluator.scala:17-98``
(AdvancedRankingMetrics vocabulary). Metrics are computed with DataFrame
expressions over the per-user arrays — no RDD collect, unlike the
reference's ``RDD[(Array, Array)]`` + mllib RankingMetrics path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class RankingEvaluator:
    """``evaluate(df)`` where df has ``predictionCol`` (array of
    recommended ids, ranked) and ``labelCol`` (array of relevant ids)."""

    def __init__(self, k: int = 10, predictionCol: str = "prediction",
                 labelCol: str = "label"):
        self.k, self.predictionCol, self.labelCol = k, predictionCol, labelCol

    def _per_user(self, df: DataFrame) -> DataFrame:
        k = self.k
        pred = F.slice(F.col(self.predictionCol), 1, k)
        label = F.col(self.labelCol)
        hits = F.size(F.array_intersect(pred, label))
        # dcg: sum over positions of rel_i / log2(i+1)
        dcg = F.aggregate(
            F.zip_with(
                pred,
                F.sequence(F.lit(1), F.greatest(F.size(pred), F.lit(1))),
                lambda p, i: F.when(
                    F.array_contains(label, p),
                    F.lit(1.0) / F.log2(i.cast("double") + 1.0),
                ).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0), lambda a, v: a + v,
        )
        # sequence(1, 0) would generate a DESCENDING [1, 0] for an
        # empty label and hit log2(1)=0 — guard the bound to >= 1; the
        # ndcg when(idcg > 0) below keeps the empty-label row at 0.
        idcg = F.when(F.size(label) > 0, F.aggregate(
            F.sequence(F.lit(1),
                       F.greatest(F.least(F.size(label), F.lit(k)), F.lit(1))),
            F.lit(0.0),
            lambda a, i: a + F.lit(1.0) / F.log2(i.cast("double") + 1.0),
        )).otherwise(F.lit(0.0))
        # average precision@k
        ap = F.aggregate(
            F.zip_with(
                pred,
                F.sequence(F.lit(1), F.greatest(F.size(pred), F.lit(1))),
                lambda p, i: F.when(
                    F.array_contains(label, p),
                    F.size(F.array_intersect(F.slice(F.col(self.predictionCol), 1,
                                                     i.cast("int")), label))
                    .cast("double") / i.cast("double"),
                ).otherwise(F.lit(0.0)),
            ),
            F.lit(0.0), lambda a, v: a + v,
        )
        # Empty-label rows have no relevant set: recall and AP are
        # undefined (0/0) — NULL them so F.avg excludes the row (ANSI
        # mode would otherwise throw DIVIDE_BY_ZERO).
        n_label = F.size(label)
        return df.select(
            (hits.cast("double") / F.lit(float(k))).alias("precision_at_k"),
            F.when(n_label > 0, hits.cast("double") / n_label)
            .alias("recall_at_k"),
            F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)).alias("ndcg_at_k"),
            F.when(n_label > 0,
                   ap / F.least(n_label, F.lit(k)).cast("double"))
            .alias("average_precision"),
        )

    def evaluate(self, df: DataFrame) -> dict[str, float]:
        agg = self._per_user(df).agg(
            F.avg("precision_at_k").alias("precisionAtK"),
            F.avg("recall_at_k").alias("recallAtK"),
            F.avg("ndcg_at_k").alias("ndcgAt"),
            F.avg("average_precision").alias("map"),
        ).collect()[0]
        return {k: (float(v) if v is not None else 0.0)
                for k, v in agg.asDict().items()}

    def evaluate_all(self, df: DataFrame, nItems: int | None = None
                     ) -> dict[str, float]:
        """All eight AdvancedRankingMetrics
        (RankingEvaluator.scala:22-98), with the reference's exact —
        sometimes idiosyncratic — definitions:

        - ``recallAtK``: |distinct(pred) ∩ distinct(label)| / |pred|
          (the reference divides by the PREDICTION length, :29-32);
        - ``diversityAtK``: distinct items recommended across all
          users / ``nItems`` (:33-35);
        - ``maxDiversity``: |(∪ labels) ∪ (∪ preds)| / ``nItems``
          (:36-43);
        - ``mrr``: 1 / (1-based position of the first relevant item in
          the full prediction list), 0 when no hit (:44-63);
        - ``fcp``: over positions i < |label|, fraction with
          pred[i] == label[i] (:64-76); rows with an empty pairing
          (no label or no prediction) are excluded from the average,
          as the reference's NaN rows are.

        ``nItems`` defaults to the maxDiversity numerator (making
        maxDiversity 1.0) when not given. Everything is DataFrame
        expressions + two distinct-count aggs — no RDDs, no collect of
        per-user data (the reference reduces the whole prediction set
        onto the driver at :22-24)."""
        pred = F.col(self.predictionCol)
        label = F.col(self.labelCol)
        base = self.evaluate(df)
        # NULL-guarded like every other division here: ANSI mode
        # (Spark 4 default) throws DIVIDE_BY_ZERO for a user with an
        # empty prediction list
        recall_ref = F.when(
            F.size(pred) > 0,
            F.size(F.array_intersect(
                F.array_distinct(pred), F.array_distinct(label)))
            .cast("double") / F.size(pred))
        first_hit = F.array_position(
            F.transform(pred, lambda p: F.array_contains(label, p)),
            F.lit(True))
        mrr = F.when(first_hit > 0,
                     F.lit(1.0) / first_hit.cast("double")).otherwise(0.0)
        paired = F.zip_with(
            F.slice(pred, 1, F.size(label)),
            F.slice(label, 1, F.least(F.size(pred), F.size(label))),
            lambda p, l: (p == l).cast("int"))
        nc = F.aggregate(paired, F.lit(0), lambda a, v: a + v)
        den = F.size(paired)
        # Zero-denominator rows (empty label or prediction) yield NULL,
        # which F.avg excludes — matching the reference's NaN row
        # semantics (RankingEvaluator.scala:64-76, nc/(nc+nd) on an
        # empty pairing is NaN and drops out of its mean) instead of
        # diluting the average with 0.0.
        fcp = F.when(den > 0, nc.cast("double") / den)
        row = df.agg(F.avg(recall_ref).alias("recallAtK"),
                     F.avg(mrr).alias("mrr"),
                     F.avg(fcp).alias("fcp")).collect()[0]
        n_rec = (df.select(F.explode(pred).alias("i"))
                 .agg(F.countDistinct("i")).collect()[0][0]) or 0
        n_all = (df.select(F.explode(F.concat(pred, label)).alias("i"))
                 .agg(F.countDistinct("i")).collect()[0][0]) or 0
        total = float(nItems if nItems is not None else n_all)
        return {
            "map": base["map"], "ndcgAt": base["ndcgAt"],
            "precisionAtk": base["precisionAtK"],
            "recallAtK": float(row.recallAtK or 0.0),
            "diversityAtK": (n_rec / total) if total else 0.0,
            "maxDiversity": (n_all / total) if total else 0.0,
            "mrr": float(row.mrr or 0.0),
            "fcp": float(row.fcp or 0.0),
        }


class RankingAdapter:
    """Wrap a recommender for ranking evaluation.

    Parity: reference ``core/.../recommendation/RankingAdapter.scala:1-161``
    — fit the recommender on train interactions, then emit per-user
    (prediction = top-k recommended items, label = ground-truth items)
    for ``RankingEvaluator``.

    ``recommender`` must expose ``fit(df) -> model`` where the model has
    ``recommend_for_all_users(k) -> (user, item, score, rank)`` (SARModel
    shape) — or pass ``recs_fn(model, k)`` for other recommenders.
    """

    def __init__(self, recommender=None, k: int = 10,
                 userCol: str = "user", itemCol: str = "item",
                 recs_fn=None):
        self.recommender, self.k = recommender, k
        self.userCol, self.itemCol = userCol, itemCol
        self.recs_fn = recs_fn

    def fit(self, train: DataFrame) -> "RankingAdapterModel":
        model = self.recommender.fit(train)
        return RankingAdapterModel(model, self.k, self.userCol,
                                   self.itemCol, self.recs_fn)


class RankingAdapterModel:
    def __init__(self, model, k, userCol, itemCol, recs_fn=None):
        self.model, self.k = model, k
        self.userCol, self.itemCol = userCol, itemCol
        self.recs_fn = recs_fn

    def transform(self, test: DataFrame) -> DataFrame:
        if self.recs_fn is not None:
            recs = self.recs_fn(self.model, self.k)
        else:
            recs = self.model.recommend_for_all_users(self.k)
        # rank rides inside the collected struct + sort_array:
        # collect_list has NO ordering guarantee after the groupBy
        # shuffle (the sar.py fix pattern) — scrambled prediction
        # order silently corrupts ndcg/map/mrr
        pred = (recs.groupBy(self.userCol)
                .agg(F.sort_array(F.collect_list(
                    F.struct("rank", self.itemCol))).alias("__p"))
                .select(self.userCol,
                        F.transform("__p", lambda r: r[self.itemCol])
                        .alias("prediction")))
        label = (test.groupBy(self.userCol)
                 .agg(F.collect_set(self.itemCol).alias("label")))
        return label.join(pred, self.userCol, "inner")


class RankingTrainValidationSplit:
    """Per-user holdout split + ranking metrics.

    Parity: reference ``recommendation/RankingTrainValidationSplit.scala
    :1-354`` — split each user's interactions train/validation, fit via
    the adapter, evaluate map/ndcg/precision/recall@k.
    """

    def __init__(self, adapter: RankingAdapter, trainRatio: float = 0.75,
                 seed: int = 42):
        self.adapter, self.trainRatio, self.seed = adapter, trainRatio, seed

    def fit(self, df: DataFrame) -> dict:
        from mmlspark_spark.core.cache import persist_intermediate

        user = self.adapter.userCol
        # hash over (user, item, seed): hashing the item alone made a
        # given item systematically always-train (or always-test) for
        # EVERY user, biasing the holdout. The ranked frame is pinned
        # so the fit job and the evaluate job split against the SAME
        # materialization — re-executing the plan re-ranks tied
        # duplicate interactions arbitrarily, which can leak one
        # physical row into both sides.
        w = Window.partitionBy(user).orderBy(
            F.xxhash64(F.col(user), F.col(self.adapter.itemCol),
                       F.lit(self.seed)),
            F.col(self.adapter.itemCol))
        counted = persist_intermediate(df.withColumn(
            "__rn", F.row_number().over(w)
        ).withColumn("__n", F.count("*").over(Window.partitionBy(user))))
        train = counted.filter(
            F.col("__rn") <= F.greatest(
                (F.col("__n") * self.trainRatio).cast("int"), F.lit(1))
        ).drop("__rn", "__n")
        test = counted.filter(
            F.col("__rn") > F.greatest(
                (F.col("__n") * self.trainRatio).cast("int"), F.lit(1))
        ).drop("__rn", "__n")
        model = self.adapter.fit(train)
        ranked = model.transform(test)
        metrics = RankingEvaluator(
            k=self.adapter.k, predictionCol="prediction", labelCol="label"
        ).evaluate(ranked)
        counted.unpersist()
        return {"model": model, "metrics": metrics}
