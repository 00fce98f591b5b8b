"""Anomaly detection + cyber feature engineering.

Parity: reference ``core/src/main/python/mmlspark/cyber/`` (scalers,
indexers, complement access, ALS-based AccessAnomaly) and
``core/.../isolationforest/IsolationForest.scala``.
"""

from mmlspark_spark.anomaly.scalers import (
    LinearScalarScaler,
    StandardScalarScaler,
)
from mmlspark_spark.anomaly.indexers import IdIndexer, MultiIndexer
from mmlspark_spark.anomaly.complement import ComplementAccessTransformer
from mmlspark_spark.anomaly.iforest import IsolationForest, IsolationForestModel
from mmlspark_spark.anomaly.access import AccessAnomaly

__all__ = [
    "StandardScalarScaler", "LinearScalarScaler", "IdIndexer", "MultiIndexer",
    "ComplementAccessTransformer", "IsolationForest", "IsolationForestModel",
    "AccessAnomaly",
]
