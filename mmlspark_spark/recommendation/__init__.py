"""Recommendation: SAR (Smart Adaptive Recommendations) + indexers.

Parity: reference ``core/src/main/scala/com/microsoft/ml/spark/
recommendation/`` (SAR.scala, SARModel.scala, RecommendationIndexer.scala).
"""

from mmlspark_spark.recommendation.sar import SAR, SARModel
from mmlspark_spark.recommendation.indexer import (
    RecommendationIndexer,
    RecommendationIndexerModel,
)

__all__ = ["SAR", "SARModel", "RecommendationIndexer", "RecommendationIndexerModel"]
