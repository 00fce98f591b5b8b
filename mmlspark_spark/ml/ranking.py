"""RankingEvaluator — map, ndcg@k, precision@k, recall@k over
(prediction-list, label-list) pairs.

Parity: reference ``core/.../recommendation/RankingEvaluator.scala:17-98``
(AdvancedRankingMetrics vocabulary). Metrics are computed with DataFrame
expressions over the per-user arrays — no RDD collect, unlike the
reference's ``RDD[(Array, Array)]`` + mllib RankingMetrics path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        idcg = F.aggregate(
            F.sequence(F.lit(1), F.least(F.size(label), F.lit(k))),
            F.lit(0.0),
            lambda a, i: a + F.lit(1.0) / F.log2(i.cast("double") + 1.0),
        )
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
        ) / F.least(F.size(label), F.lit(k)).cast("double")
        return df.select(
            (hits.cast("double") / F.lit(float(k))).alias("precision_at_k"),
            (hits.cast("double") / F.size(label)).alias("recall_at_k"),
            F.when(idcg > 0, dcg / idcg).otherwise(F.lit(0.0)).alias("ndcg_at_k"),
            ap.alias("average_precision"),
        )

    def evaluate(self, df: DataFrame) -> dict[str, float]:
        agg = self._per_user(df).agg(
            F.avg("precision_at_k").alias("precisionAtK"),
            F.avg("recall_at_k").alias("recallAtK"),
            F.avg("ndcg_at_k").alias("ndcgAt"),
            F.avg("average_precision").alias("map"),
        ).collect()[0]
        return {k: float(v) for k, v in agg.asDict().items()}
